"""Byte-pair-encoding tokenizer training over a document corpus.

The classic iterative-merge trainer (Sennrich et al. 2016): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The LLM-pipeline staple this engine's token-counting ops estimate —
here it's the real trainer, Spark-shaped:

* ONE corpus scan builds the (word, freq) vocabulary — after that,
  every merge iteration runs over the DISTINCT-WORD table (vocab-sized,
  orders of magnitude smaller than the corpus; the trainer's classic
  scaling property);
* each iteration is one pair-count aggregation (explode adjacent pairs
  weighted by word freq, map-side combined) + a 1-row top-pair collect
  (deterministic tie-break: count desc, pair asc) + a JVM fold that
  rewrites each word's symbol array left-to-right — no Python in the
  per-word path;
* ``localCheckpoint`` every few merges truncates the growing lineage.

``bpe_apply`` tokenizes text with a learned merge table via an
Arrow-batched ``mapInPandas`` (the merge loop is inherently sequential
per word — the honest Python-UDF case), broadcasting the merge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _word_freqs(docs: DataFrame) -> DataFrame:
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(left: str, right: str):
    """Fold a symbol array, merging every left-to-right occurrence of
    (left, right) — the BPE merge step, as a JVM aggregate."""
    merged = left + right

    def step(acc, x):
        # acc: struct(out array<string>, prev string); prev holds a
        # pending `left` symbol (it may merge with the next symbol)
        flush = F.when(
            acc.prev == F.lit(left),
            F.when(
                x == F.lit(right),
                F.struct(
                    F.concat(acc.out, F.array(F.lit(merged))).alias("out"),
                    F.lit("").alias("prev"),
                ),
            ).otherwise(
                F.when(
                    x == F.lit(left),
                    F.struct(
                        F.concat(acc.out, F.array(F.lit(left))).alias("out"),
                        F.lit(left).alias("prev"),
                    ),
                ).otherwise(
                    F.struct(
                        F.concat(acc.out, F.array(F.lit(left), x)).alias("out"),
                        F.lit("").alias("prev"),
                    )
                )
            ),
        ).otherwise(
            F.when(
                x == F.lit(left),
                F.struct(acc.out.alias("out"), F.lit(left).alias("prev")),
            ).otherwise(
                F.struct(
                    F.concat(acc.out, F.array(x)).alias("out"),
                    F.lit("").alias("prev"),
                )
            )
        )
        return flush

    return lambda col: F.aggregate(
        col,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("prev"),
        ),
        step,
        lambda acc: F.when(
            acc.prev == F.lit(left),
            F.concat(acc.out, F.array(F.lit(left))),
        ).otherwise(acc.out),
    )


def bpe_train(docs: DataFrame, n_merges: int = 50) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right,
    merged, pair_count) in merge order.  Deterministic: ties on pair
    count break lexicographically."""
    spark = docs.sparkSession
    words = _word_freqs(docs).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.element_at("syms", i + 1).alias("l"),
                                F.element_at("syms", i + 2).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < 2:
            break
        top = pairs[0]
        left, right, cnt = top["p"]["l"], top["p"]["r"], int(top["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        words = words.select(
            _merge_pair_expr(left, right)(F.col("syms")).alias("syms"), "freq"
        )
        if (rank + 1) % 5 == 0:
            words = words.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize with a learned merge list: (doc_id, n_bpe_tokens,
    n_words).  Arrow-batched ``mapInPandas`` — the merge loop is
    sequential per word (the honest Python case); the merge list rides
    the closure (broadcast-sized by construction)."""
    merge_ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word)
        while len(syms) >= 2:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = merge_ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return len(syms)

    import pandas as pd  # noqa: F401 (mapInPandas contract)

    def batch(iterator):
        for pdf in iterator:
            counts, nwords = [], []
            for text in pdf["text"]:
                words = str(text).strip().lower().split()
                counts.append(sum(encode_word(w) for w in words))
                nwords.append(len(words))
            out = pdf[["doc_id"]].copy()
            out["n_bpe_tokens"] = counts
            out["n_words"] = nwords
            yield out

    return docs.select("doc_id", "text").mapInPandas(
        batch, "doc_id long, n_bpe_tokens long, n_words long"
    )
