"""Text-analysis operators for large-scale training-data pipelines.

All of these are pure built-in-function pipelines (whole-stage codegen,
no Python UDFs): at 100 TB the cost is one scan of the documents table
with map-side projection — no shuffle except for the grouped variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Tiny per-language marker sets for the n-gram/stopword language-ID
# heuristic.  Deterministic and SQL-expressible (mirrored in the DuckDB
# oracle) — a real deployment would swap in fastText/CLD3 via pandas_udf.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "de"],
    "fr": ["le", "et", "les"],
}


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Ensure enough partitions ahead of CPU-bound per-row work.

    A small parquet file scans as a single split, serializing the
    (interpreted-HOF / hash-heavy) pipelines downstream onto one core.
    When the scan has fewer partitions than half the cores, shuffle it
    up-front — keyed, so a later ``groupBy`` on the same key reuses the
    partitioning instead of adding a second exchange.  At production
    scale (many 128 MB splits) the condition is false and this is a
    no-op, costing nothing on the 100 TB path."""
    if df.isStreaming:
        # streaming plans reject the metadata probes below (and per
        # micro-batch the source decides split counts anyway) — the
        # stream consumer owns its parallelism
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # inputFiles() is a metadata-only probe (no RDD materialization of
    # the plan, unlike df.rdd.getNumPartitions); each local-fixture file
    # is a single row-group, so files ≈ scan splits here.  It returns []
    # (not an exception) for non-file-backed plans — createDataFrame,
    # in-memory views — which are exactly the 1-partition inputs that
    # most need spreading, so fall back to the real partition count.
    n_splits = len(df.inputFiles())
    if n_splits == 0:
        n_splits = df.rdd.getNumPartitions()
    if 0 < n_splits * 2 < target:
        return df.repartition(target, *keys) if keys else df.repartition(target)
    return df


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token + char counts per document."""
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# GPT-2-style pre-tokenizer, reduced to an RE2/Java-portable core:
# optional leading space + letter run | digit run | punctuation run,
# falling back to whitespace runs.  (The upstream pattern's negative
# lookahead and unicode categories are dropped so the same pattern runs
# identically under Spark (Java regex) and the DuckDB (RE2) oracle.)
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\t\n\r ]+|[\t\n\r ]+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """BPE-ish token counts: the subword-tokenizer-shaped estimate
    (letters/digits/punctuation split like a GPT-2 pre-tokenizer) next
    to the plain whitespace count — the usual pair of corpus-size
    metrics.  One scan, both counts from built-in regex functions."""
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Cheap quality heuristics: mean word length, punctuation ratio,
    stopword ratio — the usual pre-training corpus filters."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks).cast("double")
    n_chars = F.length("text").cast("double")
    punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("double")
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to"))
    ).cast("double")
    return docs.select(
        "doc_id",
        F.round(n_chars / n_tokens, 4).alias("mean_word_len"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(stop / n_tokens, 4).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hit
    counts; ties/no-hits → 'und'."""
    toks = _tokens(F.lower(F.col("text")))

    def marker_pred(markers):
        # NB: pyspark HOFs dispatch on lambda arity — a default-arg
        # closure would be mistaken for the (element, index) form.
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    # deterministic argmax: highest score wins, lexicographic lang breaks ties
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return docs.select("doc_id", best.alias("pred_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint (md5 of case/space-normalized
    text) — the key for exact dedup at any scale (hash-groupBy)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Corpus-level exact-duplication summary: total vs distinct
    fingerprints (the 0-th dedup question at 100 TB)."""
    fp = fingerprints(docs)
    return fp.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct("fp").alias("distinct_docs"),
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of exact duplicates (fingerprint, member count, kept doc),
    keeping the smallest doc_id per group — the standard keep-one rule."""
    return (
        fingerprints(docs)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → array of word n-gram shingles (input to MinHash/Jaccard).

    The token array is materialized in its own projection on purpose:
    inlined into the slice lambda, Catalyst re-evaluates the regexp
    tokenization per shingle (HOF lambdas don't share subexpressions) —
    measured ~5× slower at sf0.1.  A separate alias referenced twice is
    non-cheap, so CollapseProject keeps it materialized."""
    tokenized = _spread(docs, "doc_id").select(
        "doc_id", _tokens(F.lower(F.col("text"))).alias("__toks")
    )
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("__toks") - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, n)),
        )
    )
    return tokenized.select("doc_id", shingles.alias("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, block_on: str = "lang"
) -> DataFrame:
    """Exact n-gram Jaccard similarity for same-``block_on`` pairs.

    Sparse co-occurrence shape: explode (distinct) shingles, equi-join
    on the shingle itself, count shared shingles per pair, then
    ``|A∪B| = |A| + |B| - |A∩B|``.  Exact for any threshold > 0 (a pair
    with no shared shingle has Jaccard 0), while only materializing
    pairs that actually co-occur — unlike a blocked cross join, the
    parallelism is keyed by shingle, not by a handful of block values,
    so it survives both scale-up and skewed blocks."""
    sh = ngram_shingles(docs, n).join(docs.select("doc_id", block_on), "doc_id")
    sizes = sh.select("doc_id", block_on, F.size("shingles").alias("sz"))
    ex = sh.select("doc_id", block_on, F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{block_on}") == F.col(f"b.{block_on}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, block_on: str = "lang"
) -> DataFrame:
    """(doc_a, doc_b, containment) — ASYMMETRIC n-gram containment
    C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| for same-``block_on``
    pairs, both directions emitted.  The sub-document dup detector:
    a short doc quoted inside a long one has high containment but LOW
    Jaccard (the union is dominated by the long doc), so a Jaccard
    threshold misses exactly the quotes/boilerplate/partial-copy cases
    containment exists for (Broder's resemblance-vs-containment
    distinction).

    Same sparse co-occurrence shape as :func:`ngram_jaccard_pairs`:
    shingle-keyed equi-join (parallelism keyed by shingle, not block),
    exact integer intersection counts, one division per emitted row —
    only co-occurring pairs materialize, never the cross join."""
    sh = ngram_shingles(docs, n).join(docs.select("doc_id", block_on), "doc_id")
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    ex = sh.select("doc_id", block_on, F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{block_on}") == F.col(f"b.{block_on}"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cont = F.col("inter").cast("double") / F.col("sz_a").cast("double")
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        )
        .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def hashed_token_features(
    docs: DataFrame, dim: int = 4096, salt: str = "pc"
) -> DataFrame:
    """(doc_id, idx, cnt) — hashed bag-of-words features (the fastText
    / CCNet feature map): token → ``md5(salt-token) % dim``, integer
    counts, plus a constant bias feature at ``idx = dim``.  All JVM
    (md5 + pmod in whole-stage codegen); the md5 hash makes feature
    indices engine- and run-portable.

    100 TB shape: one map-side pass + a (doc, idx)-keyed
    partial-aggregated count — output is bounded by docs × distinct
    tokens per doc, never the corpus vocabulary."""
    toks = _spread(docs, "doc_id").select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("__t")
    ).filter(F.col("__t") != "")
    idx = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}-"), F.col("__t"))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(dim),
    ).cast("int")
    counts = toks.select("doc_id", idx.alias("idx")).groupBy(
        "doc_id", "idx"
    ).agg(F.count(F.lit(1)).cast("int").alias("cnt"))
    bias = docs.select(
        "doc_id", F.lit(int(dim)).alias("idx"), F.lit(1).alias("cnt")
    )
    return counts.unionByName(bias)


def perceptron_train(
    features: DataFrame,
    labels: DataFrame,
    epochs: int = 3,
    shards: int = 4,
    salt: str = "pc",
) -> DataFrame:
    """(idx, weight) — averaged-perceptron text classifier trained by
    PARAMETER MIXING (McDonald et al. 2010): docs shard by md5(doc_id),
    each shard runs the full averaged-perceptron loop locally inside
    one Arrow ``applyInPandas`` task (docs visited in sorted doc_id
    order, ``epochs`` local passes), and the shard weight vectors SUM
    into the final model.  Everything is INTEGER — perceptron updates
    are ±count, the averaging trick keeps ``w·C − u`` integral, and the
    merge is an integer sum (order-independent) — so the trained model
    is bit-deterministic across any partitioning.

    ``labels``: (doc_id, y) with y ∈ {+1, −1}.  The supervised member
    of the trainer family (quality/domain filters à la CCNet); the
    sequential update loop is not SQL-expressible, so driver keys are
    rows-only with :func:`classifier_gate` pinning quality.

    100 TB shape: features roll up per doc (one shuffle), shards train
    in parallel (model size = active vocab × 8 bytes per shard — the
    hashed dim bounds it), the merge is one tiny integer aggregation.
    More mixing rounds (re-broadcast + retrain) would tighten parity
    with the sequential perceptron; one round is the standard
    throughput/quality trade."""
    feat_rows = (
        features.join(labels, "doc_id")
        .groupBy("doc_id", "y")
        .agg(
            F.collect_list(F.struct("idx", "cnt")).alias("fs"),
        )
        .withColumn(
            "__shard",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}|"), F.col("doc_id").cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(shards),
            ),
        )
    )

    def train(pdf):
        import pandas as _pd

        w: dict[int, int] = {}
        u: dict[int, int] = {}
        c = 1
        pdf = pdf.sort_values("doc_id")
        for _ in range(epochs):
            for r in pdf.itertuples(index=False):
                fs = [(int(f["idx"]), int(f["cnt"])) for f in r.fs]
                s = sum(w.get(i, 0) * n for i, n in fs)
                yhat = 1 if s > 0 else -1
                if yhat != int(r.y):
                    for i, n in fs:
                        w[i] = w.get(i, 0) + int(r.y) * n
                        u[i] = u.get(i, 0) + c * int(r.y) * n
                c += 1
        keys = sorted(w)
        return _pd.DataFrame(
            {
                "idx": keys,
                "weight": [w[i] * c - u.get(i, 0) for i in keys],
            }
        )

    return (
        feat_rows.groupBy("__shard")
        .applyInPandas(train, "idx int, weight long")
        .groupBy("idx")
        .agg(F.sum("weight").alias("weight"))
    )


def perceptron_score(features: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, score, pred) — apply a trained perceptron: one
    broadcast join on the hashed feature index + a per-doc integer
    dot product.  ``pred`` is ``score > 0``."""
    return (
        features.join(F.broadcast(weights), "idx")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
        .withColumn("pred", F.col("score") > 0)
    )


def classifier_gate(
    docs: DataFrame,
    dim: int = 4096,
    epochs: int = 20,
    shards: int = 2,
    floor: float = 0.85,
) -> DataFrame:
    """(method, accuracy, meets_floor) — the supervised-trainer quality
    gate: plant an exactly-linear concept in the corpus (y = +1 iff
    count('spark') + count('query') > count('table') — linearly
    representable over the hashed features), train on even doc_ids,
    evaluate held-out accuracy on odd doc_ids.  A trainer that can't
    recover a planted linear concept from text regressed — same gate
    discipline as the ANN/embedding recall floors.  Defaults carry
    measured margin (epochs 20 / shards 2 → 0.928 held-out at sf0.01
    vs the 0.85 floor; mixing across more shards dilutes — 4 shards
    measured 0.85, the documented parameter-mixing trade)."""
    toks = _tokens(F.lower(F.col("text")))
    # y = +1 iff #spark + #query > #table
    planted = (
        F.size(F.filter(toks, lambda t: t.isin("spark", "query")))
        > F.size(F.filter(toks, lambda t: t == "table"))
    )
    labeled = _spread(docs, "doc_id").select(
        "doc_id",
        F.when(planted, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )
    feats = hashed_token_features(docs, dim=dim).localCheckpoint(eager=False)
    train_lab = labeled.filter(F.col("doc_id") % 2 == 0)
    test_lab = labeled.filter(F.col("doc_id") % 2 == 1)
    wts = perceptron_train(feats, train_lab, epochs=epochs, shards=shards)
    scored = perceptron_score(
        feats.join(test_lab.select("doc_id"), "doc_id"), wts
    )
    joined = scored.join(test_lab, "doc_id")
    agg = joined.agg(
        F.sum(
            F.when(
                (F.col("pred") & (F.col("y") == 1))
                | (~F.col("pred") & (F.col("y") == -1)),
                1,
            ).otherwise(0)
        ).alias("hits"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    acc = (agg["hits"] / agg["n"]) if agg["n"] else 0.0
    return docs.sparkSession.createDataFrame(
        [("perceptron", float(round(acc, 4)), acc >= floor)],
        "method string, accuracy double, meets_floor boolean",
    )


# Simple, DuckDB-mirrorable patterns (kept RE2/Java-portable: no
# backreferences or lookaround) — a production pipeline would extend
# the set, not the mechanism.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "url": r"https?://[^\s]+",
}


def pii_scrub(docs: DataFrame, patterns: dict[str, str] | None = None) -> DataFrame:
    """Per-doc PII detection + redaction — the scrub pass every
    training-data pipeline runs before tokenization.  One scan, all
    JVM regex (whole-stage codegen): per-pattern match counts plus the
    redacted text with each match replaced by ``[TYPE]``.

    Beyond-reference training-data operator (same family as
    ``quality_scores``); patterns are RE2/Java-portable so the DuckDB
    oracle runs the identical expressions."""
    patterns = patterns or PII_PATTERNS
    out = docs.select("doc_id", "text")
    scrubbed = F.col("text")
    counts = []
    for name, rx in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all("text", F.lit(rx), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, rx, f"[{name.upper()}]")
    return out.select(
        "doc_id",
        *counts,
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    ``n``-gram with an eval/benchmark set (the n-gram-overlap method
    used for public-corpus decontamination).  Shape: explode distinct
    n-grams on both sides → equi-join on the gram → per-doc overlap
    count.  Benchmark grams are deduped and broadcast (eval sets are
    tiny next to the corpus), so the training side never shuffles for
    the join — hot grams can't skew a broadcast join — and the only
    shuffle is the per-doc overlap aggregation, keyed by doc_id."""
    def grams(df, id_col):
        toks = _tokens(F.lower(F.col("text")))
        g = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )
        return df.select(F.col("doc_id").alias(id_col), F.explode(g).alias("gram"))

    doc_grams = grams(docs, "doc_id")
    bench_grams = grams(benchmark, "bench_id").select("gram").distinct()
    # Explicit broadcast: AQE usually converts this below the threshold,
    # but an eval set slightly over it would silently become a full
    # gram-keyed shuffle of the corpus — make the contract structural.
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") > 0)
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Intra-document repetition signals (Gopher-style quality rules):
    distinct-token ratio and the most-frequent-token share, per doc.

    100 TB shape: ONE scan, zero shuffles — every number comes from
    JVM higher-order functions on the token array.  The top-token count
    is a sort + run-length fold over the sorted array (O(n log n) per
    doc in whole-stage codegen) rather than the explode → groupBy a
    naive version would shuffle the whole corpus through.
    """
    toks = _tokens(F.col("text"))
    sorted_toks = F.array_sort(toks)
    # fold: track previous token, current run, best run
    top_run = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct"),
        F.round(n_distinct / n, 4).alias("distinct_ratio"),
        top_run.cast("bigint").alias("top_token_count"),
        F.round(top_run / n, 4).alias("top_token_share"),
    )


def dup_ngram_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style duplicate-n-gram quality signals, per document:
    the fraction of characters covered by n-grams that occur more than
    once, and the character share of the single most common n-gram
    (Rae et al. 2021 repetition rules — the dup-5-gram / top-2-gram
    family).

    100 TB shape: ONE scan, ZERO shuffles — the n-gram array, its
    sorted run-length fold (duplicate chars + best run) and the totals
    are all JVM higher-order functions per row; nothing explodes into
    a corpus-wide groupBy.  Ties for "most common" resolve to the
    lexicographically smallest gram (first in sorted traversal), which
    the oracle mirrors with ORDER BY count DESC, gram ASC.
    """
    toks = _tokens(F.col("text"))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sorted_grams = F.array_sort(grams)
    zero = F.lit(0).cast("bigint")
    fold = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            zero.alias("dup"),
            F.lit(0).alias("best"),
            zero.alias("bestc"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            # chars over EVERY copy of a duplicated gram: the second
            # sighting back-credits the first (2×len), later ones +len
            (
                acc.dup
                + F.when(
                    x == acc.prev,
                    F.when(acc.run == 1, F.length(x) * 2).otherwise(F.length(x)),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
            ).alias("dup"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)) > acc.best,
                (
                    F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
                    * F.length(x)
                ).cast("bigint"),
            )
            .otherwise(acc.bestc)
            .alias("bestc"),
        ),
    )
    total = F.aggregate(
        grams, zero, lambda acc, x: acc + F.length(x).cast("bigint")
    )
    return (
        docs.withColumn("_f", fold)
        .withColumn("_t", total)
        .select(
            "doc_id",
            F.size(grams).cast("bigint").alias("n_grams"),
            F.col("_f.dup").alias("dup_gram_chars"),
            F.col("_f.bestc").alias("top_gram_chars"),
            F.col("_t").alias("gram_chars"),
            F.when(F.col("_t") > 0, F.round(F.col("_f.dup") / F.col("_t"), 4))
            .otherwise(F.lit(0.0))
            .alias("dup_char_frac"),
            F.when(F.col("_t") > 0, F.round(F.col("_f.bestc") / F.col("_t"), 4))
            .otherwise(F.lit(0.0))
            .alias("top_char_frac"),
        )
    )


def top_bigrams(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k bigram counts with a total deterministic order
    (count desc, bigram asc) — the corpus-statistics staple.

    100 TB shape: bigrams are generated in-plan from the token array
    (no self-join), the count is a map-side-combined groupBy on the
    bigram key, and only the k winners reach the driver (TakeOrdered).
    """
    words = _tokens(F.col("text"))
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the classic
    gibberish / binary-noise quality filter (low-entropy = repeated
    junk, high-entropy = random bytes).

    100 TB shape: ONE scan, zero shuffles.  The per-doc character
    histogram is never materialized: characters are sorted in-plan and
    a run-length fold accumulates Σ count·ln(count) incrementally, so
    entropy = ln(n) − Σ c·ln(c) / n comes out of whole-stage codegen.
    (The naive explode → groupBy(doc, char) version shuffles the entire
    corpus' characters.)
    """
    chars = F.array_sort(F.split(F.col("text"), ""))
    n = F.size(chars)
    fold = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            (
                a.acc
                + F.when(
                    x == a.prev, F.lit(0.0)
                ).otherwise(  # close the previous run
                    F.when(a.run > 0, a.run * F.log(a.run.cast("double"))).otherwise(
                        F.lit(0.0)
                    )
                )
            ).alias("acc"),
        ),
        # close the final run
        lambda a: a.acc
        + F.when(a.run > 0, a.run * F.log(a.run.cast("double"))).otherwise(F.lit(0.0)),
    )
    return (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_chars_split"),
            F.round(F.log(n.cast("double")) - fold / n, 4).alias("entropy"),
        )
    )


def length_histogram(docs: DataFrame, bucket: int = 100) -> DataFrame:
    """Document-length histogram (fixed-width buckets on ``n_chars``)
    — the first plot anyone draws over a new corpus, and the input to
    length-based filtering thresholds.

    100 TB shape: map-side projection to the bucket key, map-side
    combined count/sum, one tiny shuffle of at most a few thousand
    bucket rows regardless of corpus size.
    """
    lo = (F.floor(F.col("n_chars") / bucket) * bucket).cast("bigint")
    return (
        docs.select(lo.alias("bucket_lo"), "n_chars")
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def vocab_stats(docs: DataFrame) -> DataFrame:
    """Corpus vocabulary summary: total token occurrences, distinct
    vocabulary size, and type/token ratio.

    100 TB shape: the total comes from a map-side size() sum (no
    explode shuffle); only the DISTINCT needs the exploded token
    stream, and that aggregation is map-side partial (each task emits
    its local distinct set) before one vocabulary-sized exchange.
    """
    toks = _tokens(F.lower(F.col("text")))
    totals = docs.agg(F.sum(F.size(toks)).cast("bigint").alias("total_tokens"))
    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return totals.crossJoin(vocab).select(
        "total_tokens",
        "vocab_size",
        F.round(F.col("vocab_size") / F.col("total_tokens"), 6).alias(
            "type_token_ratio"
        ),
    )


def idf_top_terms(docs: DataFrame, k: int = 50) -> DataFrame:
    """Per-term document frequency and inverse document frequency for
    the k most common terms (count desc, term asc — total order).

    100 TB shape: per-doc DISTINCT terms come from array_distinct
    in-plan (no doc×token shuffle of repeated tokens), document
    frequency is a map-side-combined count on the term key, the corpus
    size N is a 1-row broadcast, and only k winners reach the driver
    (TakeOrdered).
    """
    terms = docs.select(
        F.explode(F.array_distinct(_tokens(F.lower(F.col("text"))))).alias("term")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    df_counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        df_counts.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.round(F.log(F.col("__n") / F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """One row per column: null count, distinct count, min/max (string
    rendering) — the ingest-time data-quality profile every pipeline
    run should persist next to its output.

    Single pass over the table: all per-column aggregates evaluate in
    ONE aggregation (no per-column scans), then a literal-width explode
    reshapes wide→long driver-free.  ``approx=True`` switches distinct
    counts to ``approx_count_distinct`` (HLL) — the 100 TB default,
    where exact distinct on a wide table is a shuffle per column; exact
    is the local/oracle mode."""
    cols = df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__n_{c}"))
        d = (
            F.approx_count_distinct(col)
            if approx
            else F.count_distinct(col)
        )
        aggs.append(d.alias(f"__d_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_null"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")


def clean_corpus_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_chars: int = 100,
    max_chars: int = 520,
) -> DataFrame:
    """(stage, n_rows) — the composed training-corpus cleaning funnel:
    raw → exact dedup (keep min doc_id per text hash) → length band →
    benchmark decontamination.  One lazy plan: each stage count is an
    aggregate over the previous stage's frame, so the whole funnel is
    the stage operators composed — dedup's hash-groupBy shuffle, a
    pushed length filter, and decontaminate's broadcast gram join —
    with only four counter rows ever leaving the executors."""
    reps = (
        docs.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(reps, "doc_id", "left_semi")
    sized = survivors.filter(
        F.col("n_chars").between(min_chars, max_chars)
    )
    contaminated = decontaminate(sized, benchmark, n=n).select("doc_id")
    clean = sized.join(contaminated, "doc_id", "left_anti")

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )

    return (
        stage("1_raw", docs)
        .unionByName(stage("2_exact_dedup", survivors))
        .unionByName(stage("3_length_filter", sized))
        .unionByName(stage("4_decontaminated", clean))
    )


def pack_sequences(
    docs: DataFrame, budget: int = 2048, salt: str = "pack"
) -> DataFrame:
    """Greedy start-offset sequence packing: assign each document to a
    fixed-token-budget pack for training-batch assembly.

    The 100 TB shape: documents are first hash-bucketed (first hex char
    of a salted md5 — 16 independent packing streams, the same portable
    bucket rule the sampling module uses), then packed WITHIN a bucket
    by a running token total over a deterministic order — one window
    per bucket, never a global single-partition cumsum.  ``pack_no`` =
    ``(cumsum_before_this_doc) // budget`` ("start-offset" packing):
    deterministic, one shuffle, and SQL-expressible, at the cost of a
    pack occasionally overflowing by one document's tail (the tokenizer
    stage truncates; bin-perfect packing is a bucket-local
    ``applyInPandas`` swap if ever needed).

    Output: (doc_id, n_tokens, bucket, pack_no) — (bucket, pack_no) is
    the pack identity."""
    from pyspark.sql.window import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = token_counts(docs).select("doc_id", "n_tokens")
    bucketed = toks.withColumn(
        "bucket",
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string"))),
            1,
            1,
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return bucketed.select(
        "doc_id",
        "n_tokens",
        "bucket",
        (start / F.lit(budget)).cast("bigint").alias("pack_no"),
    )


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Quality-preferred canonical selection per near-duplicate cluster
    — the policy step after dedup: instead of keep-min-id, keep the
    LONGEST member (``n_chars`` desc, ``doc_id`` asc tie-break), which
    in practice keeps the least-truncated copy of a scraped page.

    ``pairs`` is any (doc_a, doc_b) near-dup relation (MinHash-LSH at
    scale; defaults to exact n-gram Jaccard so the output is fully
    value-checkable).  Clusters = transitive closure (connected
    components); singletons never appear (nothing to drop).

    Shape at 100 TB: pairs → CC (superstep joins over pair-graph-sized
    data, tiny vs the corpus) → one broadcast-able join back to the doc
    dims → one groupBy(cluster) argmax.  Output: (group_id,
    cluster_size, keep_doc_id, keep_n_chars, dropped) where dropped =
    cluster_size - 1 rows freed by the keep-one policy."""
    from pg_age_digitaltwins_spark.operators.similarity import near_dup_groups

    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    groups = near_dup_groups(pairs)
    members = groups.join(docs.select("doc_id", "n_chars"), "doc_id")
    best = F.max(
        F.struct(
            F.col("n_chars").alias("nc"), (-F.col("doc_id")).alias("negid")
        )
    ).alias("b")
    return (
        members.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            best,
        )
        .select(
            "group_id",
            "cluster_size",
            (-F.col("b.negid")).alias("keep_doc_id"),
            F.col("b.nc").alias("keep_n_chars"),
            (F.col("cluster_size") - 1).alias("dropped"),
        )
    )


def chunk_documents(
    docs: DataFrame, window: int = 128, stride: int = 64
) -> DataFrame:
    """Sliding-window document chunking for context-window packing:
    token windows of ``window`` starting every ``stride`` tokens, plus
    a final full-size window flush against the end when the last
    strided start would leave a tail uncovered — every token lands in
    at least one chunk and every chunk is exactly ``window`` tokens
    (short docs yield one short chunk).

    100 TB shape: one scan; the start list, slices and joins are JVM
    higher-order functions, and the per-doc fan-out is ~n/stride rows
    via ONE posexplode — no shuffle at all.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    gmax = F.greatest(n - window, F.lit(0))
    base = F.sequence(F.lit(0), gmax, F.lit(stride))
    starts = F.when(gmax % stride == 0, base).otherwise(
        F.concat(base, F.array(gmax))
    )
    return (
        docs.select(
            "doc_id", toks.alias("_t"), F.posexplode(starts).alias("chunk_idx", "start")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("start").cast("bigint").alias("start"),
            F.array_join(
                F.slice(F.col("_t"), F.col("start") + 1, window), " "
            ).alias("chunk_text"),
            F.least(F.size(F.col("_t")) - F.col("start"), F.lit(window))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


def ngram_lm_score(
    docs: DataFrame,
    train_filter=None,
    add_k: float = 1.0,
) -> DataFrame:
    """CCNet-style n-gram LM quality scoring: train an add-k-smoothed
    BIGRAM language model on a reference subset (``train_filter``,
    default ``source = 'src0'``) and score EVERY document by its mean
    token log-probability under that model — documents that look unlike
    the reference distribution score low and get filtered/bucketed
    (the public CCNet pipeline does exactly this with a KenLM 5-gram;
    the bigram form keeps the same shape with exact, oracle-checkable
    arithmetic).

    Per token-position score: ln((c(w1,w2) + k) / (c(w1) + k·V)) with
    V = train vocabulary size; unseen history backs off to ln(1/V).
    Each term is fixed-point-scaled to 1e-6 BIGINT before summation so
    the per-document total is exact-integer (summation-order-proof);
    the human-readable mean rides along as a derived double.

    100 TB shape: the LM is two map-side-combined groupBys over the
    train subset; scoring is one explode + two equi-joins against the
    count tables (broadcast when small, shuffle-join at scale — both
    sides keyed) + one doc-keyed aggregation.  No Python in the loop.
    """
    if train_filter is None:
        train_filter = F.col("source") == "src0"
    words = _tokens(F.col("text"))
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.struct(
                F.element_at(words, i + 1).alias("w1"),
                F.element_at(words, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    train = docs.filter(train_filter)
    train_big = train.select(F.explode(bigrams).alias("b")).select(
        "b.w1", "b.w2"
    )
    c12 = train_big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c1 = train_big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # vocab = distinct tokens in the train subset (histories + tails)
    v = (
        train.select(F.explode(words).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    v = int(v or 1)
    terms = docs.select(
        "doc_id", "source", F.explode(bigrams).alias("b")
    ).select("doc_id", "source", "b.w1", "b.w2")
    k = float(add_k)
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * v))
    )
    scored = (
        terms.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "doc_id",
            "source",
            F.round(logp * F.lit(1e6)).cast("long").alias("lp_fp"),
        )
    )
    agg = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("lp_fp").alias("sum_logp_fp"),
        F.round(
            (F.sum("lp_fp") / F.count(F.lit(1))) / F.lit(1e6), 6
        ).alias("mean_logp"),
    )
    # every document scores: docs with < 2 tokens emit no bigram terms,
    # so left-join the aggregate back and give them n_terms=0 with a
    # null (neutral) score rather than dropping them from the output
    return (
        docs.select("doc_id", "source")
        .join(agg, ["doc_id", "source"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_terms"), F.lit(0).cast("long")).alias(
                "n_terms"
            ),
            "sum_logp_fp",
            "mean_logp",
        )
    )


def repeated_spans(
    docs: DataFrame,
    window: int = 20,
    stride: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated token spans — the substring-dedup signal
    from "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022): a ``window``-token span appearing in ≥
    ``min_docs`` distinct documents is memorization-prone boilerplate
    (licenses, headers, templated text) that exact whole-doc dedup
    misses.

    Output: (span, n_docs, n_occurrences) for qualifying spans.

    100 TB shape: windows explode per token (÷ ``stride``), then ONE
    hash-keyed aggregation — no all-pairs comparison.  The exchange
    carries ``xxhash64(span)`` (8 bytes) rather than the span text;
    the text of each qualifying span is recovered by a semi-join of
    the qualifying hashes back against the window stream, so full
    span strings never ride the wide shuffle.  At corpus scale raise
    ``stride`` (a duplicated region ≥ window+stride tokens still
    yields an aligned colliding window) — the standard suffix-array
    approximation trade.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    starts = F.sequence(
        F.lit(1), F.size(F.col("ws")) - F.lit(window - 1), F.lit(stride)
    )
    spans = (
        docs.select("doc_id", _tokens(F.col("text")).alias("ws"))
        .filter(F.size(F.col("ws")) >= window)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.array_join(
                        F.slice(F.col("ws"), i, window), " "
                    ),
                )
            ).alias("span"),
        )
    )
    hashed = spans.select("doc_id", F.xxhash64("span").alias("h"))
    qualifying = (
        hashed.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    # recover one text per qualifying hash: filter the window stream to
    # qualifying hashes FIRST (join against the small qualifying side —
    # AQE broadcasts it), so span text aggregates only for the
    # qualifying minority; min() makes any xxhash collision
    # deterministic
    texts = (
        spans.select(F.xxhash64("span").alias("h"), "span")
        .join(qualifying, "h")
        .groupBy("h", "n_docs", "n_occurrences")
        .agg(F.min("span").alias("span"))
    )
    return texts.select("span", "n_docs", "n_occurrences")


def collocation_pmi(
    docs: DataFrame, k: int = 30, min_count: int = 5
) -> DataFrame:
    """(bigram, n_bigram, n_left, n_right, pmi) — top-``k`` bigram
    collocations by frequency with their pointwise mutual information
    PMI = ln(p(xy) / (p(x)·p(y))) — the Church-Hanks collocation
    statistic every phrase-mining / tokenizer-prep pipeline computes.

    Determinism: all counts are BIGINT-exact; the RANKING key is
    (count desc, bigram) — integers only — and the float PMI is one
    fixed-shape expression over those exact counts, evaluated
    identically by any IEEE engine, so the output value-checks.
    (Ranking BY float PMI would hang the order on ln ulps; ranking by
    count keeps the order exact while still surfacing the statistic.)

    100 TB shape: bigrams generate in-plan from the token array (no
    self-join); two map-side-combined counts (bigram-keyed and
    unigram-keyed); the unigram side joins the SURVIVING ≥min_count
    bigrams only (candidate-sized, broadcast-able), never the raw
    stream; top-k is a TakeOrdered."""
    words = _tokens(F.lower(F.col("text")))
    base = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    uni = (
        base.select(F.explode(words).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n_tok"))
    )
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.struct(
                F.element_at(words, i + 1).alias("l"),
                F.element_at(words, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    bi = (
        base.select(F.explode(bigrams).alias("bg"))
        .groupBy(F.col("bg.l").alias("l"), F.col("bg.r").alias("r"))
        .agg(F.count("*").cast("bigint").alias("n_bigram"))
        .filter(F.col("n_bigram") >= min_count)
    )
    n_uni = uni.agg(F.sum("n_tok").alias("__n")).select("__n")
    n_bi = bi.agg(F.sum("n_bigram").alias("__b")).select("__b")
    ul = uni.select(F.col("tok").alias("l"), F.col("n_tok").alias("n_left"))
    ur = uni.select(F.col("tok").alias("r"), F.col("n_tok").alias("n_right"))
    pmi = F.round(
        F.log(F.col("n_bigram").cast("double"))
        + F.lit(2.0) * F.log(F.col("__n").cast("double"))
        - F.log(F.col("__b").cast("double"))
        - F.log(F.col("n_left").cast("double"))
        - F.log(F.col("n_right").cast("double")),
        4,
    )
    return (
        bi.join(ul, "l")
        .join(ur, "r")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat_ws(" ", "l", "r").alias("bigram"),
            "n_bigram",
            "n_left",
            "n_right",
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("n_bigram"), F.asc("bigram"))
        .limit(k)
    )


def readability(docs: DataFrame) -> DataFrame:
    """(doc_id, n_sentences, n_words, n_syllables, flesch) — Flesch
    reading-ease per document with the standard regex heuristics:
    sentences = runs of [.!?], syllables = vowel-group runs (the
    Flesch-Kincaid approximation used when no dictionary is at hand).
    A cheap, language-blind quality score for corpus filtering —
    extremely high/low values flag boilerplate, code, or gibberish.

    Determinism: all three counts are exact regex-match counts
    (identical non-overlapping-match semantics across engines); the
    score is one fixed-shape float expression over them, rounded at
    the end — value-checkable.  Sentence count floors at 1 so
    fragment documents score rather than divide by zero.

    100 TB shape: pure per-row JVM regex work — no shuffle, no UDF,
    whole-stage codegen end to end."""
    n_words = F.size(_tokens(F.col("text")))
    n_sent = F.greatest(
        F.lit(1).cast("bigint"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("bigint"),
    )
    n_syll = F.regexp_count(
        F.lower(F.col("text")), F.lit("[aeiouy]+")
    ).cast("bigint")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
        3,
    )
    return docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def tfidf_top_terms_per_doc(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, term, tf, df, rank, tfidf) — per-document top-``k``
    keyword extraction: the document's highest-frequency, rarest
    terms, with the classic tf·ln(N/df) statistic as a column.

    Determinism: the RANKING key is (tf desc, df asc, term) —
    integers and strings only (the same integer-rank/float-column
    split as collocation_pmi: ranking BY the float tfidf would hang
    row selection on ln ulps; the lexicographic key is exact and is
    itself the standard keyword heuristic).  tfidf is one fixed-shape
    float expression over exact counts.

    100 TB shape: two map-side-combined counts (doc-term and
    document-frequency); the df side joins back on the term key; the
    corpus size rides as a broadcast 1-row frame; per-doc top-k is
    ONE window partitioned by doc_id."""
    words = _tokens(F.lower(F.col("text")))
    base = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    tf = (
        base.select("doc_id", F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    # (doc_id, term) is unique in tf, so count(*) IS the doc frequency
    df = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n = base.agg(F.count("*").cast("bigint").alias("__n"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            "rank",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
                4,
            ).alias("tfidf"),
        )
    )
