"""Deterministic sampling / splitting for training-data pipelines.

The split decision is a pure function of the row KEY (md5 of a salted
key rendering, compared against a hex-prefix threshold), which buys the
three properties a 100 TB pipeline needs and ``df.sample()`` lacks:

* **stability** — re-runs, repartitions, and engine upgrades keep every
  row on the same side; splits are reproducible from the salt alone;
* **portability** — any engine with md5 computes the identical split
  (the DuckDB oracles in ``__spark_entry__`` replay it verbatim);
* **no coordination** — executors decide per row; no sampling state,
  no driver involvement, no shuffle.

A 4-hex-digit prefix gives 65,536 buckets — fraction granularity
1/65536 ≈ 0.0015%, plenty for split ratios; md5 is uniform enough that
per-bucket skew is binomial noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(salt: str, *keys: Column) -> Column:
    """First 4 hex chars of md5(salt || key parts) — the portable
    bucket id this module's thresholds compare against."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *keys)), 1, 4
    )


def _threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(65535, int(fraction * 65536)), "04x")


def hash_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train' | 'test') keyed on ``key_col``.

    Rows with the same key always land on the same side — the property
    that prevents train/test leakage when a document appears twice."""
    thresh = _threshold(test_fraction)
    b = _bucket(salt, F.col(key_col).cast("string"))
    return df.withColumn(
        "split",
        F.when(b < F.lit(thresh), F.lit("test")).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction`` of EACH stratum (e.g. per language) —
    uniform downsampling that preserves the strata distribution, still
    a pure per-row decision (no per-stratum counting pass)."""
    thresh = _threshold(fraction)
    b = _bucket(
        salt, F.col(strata_col).cast("string"), F.col(key_col).cast("string")
    )
    return df.filter(b < F.lit(thresh))


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "fold",
) -> DataFrame:
    """Add a ``fold`` column in [0, k): deterministic k-fold assignment
    keyed on ``key_col`` — same key, same fold, forever, on any engine.

    The fold is the 4-hex md5 bucket modulo k (same primitive as
    ``hash_split``): still a pure per-row decision with no shuffle and
    no state.  Folds are balanced to binomial noise; keys duplicated
    across rows stay in one fold, preventing cross-fold leakage.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    b = _bucket(salt, F.col(key_col).cast("string"))
    return df.withColumn(
        "fold", (F.conv(b, 16, 10).cast("int") % F.lit(k)).cast("int")
    )


def weighted_reservoir(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int = 5,
    strata_col: str | None = None,
    salt: str = "wres",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (per stratum
    when ``strata_col`` is given): the Efraimidis–Spirakis A-ES scheme
    with the uniform drawn from md5, not a RNG.

    Each row gets u ∈ (0,1] from its key hash and priority
    ``ln(u)/w`` (monotone with u^(1/w)); the top-k priorities are the
    weighted sample.  P(selected) ∝ weight, and the same three
    properties as the rest of this module hold: stable under re-runs
    and repartitioning, portable to any engine with md5 (the DuckDB
    oracle replays the formula verbatim), and coordination-free — the
    only shuffle is the per-stratum top-k window.  Rows with null or
    non-positive weight are excluded (a zero weight has zero selection
    probability; A-ES is undefined there)."""
    from pyspark.sql.window import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    score = F.log(u) / w.cast("double")
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(
        F.col("__wr_score").desc(), F.col(key_col)
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__wr_score", score)
        .withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .drop("__wr_score")
    )


def leakage_safe_split(
    docs: DataFrame,
    test_fraction: float = 0.1,
    salt: str = "split",
    groups: DataFrame | None = None,
) -> DataFrame:
    """Train/test split keyed on the duplicate GROUP, not the document.

    Splitting per-doc leaks: two near-identical documents can straddle
    the train/test boundary and the benchmark silently measures
    memorization.  Here every document is first mapped to its group id
    — by default the exact-dedup fingerprint (md5 of case/space-
    normalized text); pass ``groups`` (doc_id, group_id), e.g.
    ``similarity.near_dup_clusters`` output, for semantic clusters —
    and the hash split is keyed on the group, so a whole duplicate
    cluster lands on one side.  Documents without a group row fall
    back to their own id (singleton group).

    Output: (doc_id, group_id, split)."""
    from pg_age_digitaltwins_spark.operators.text import fingerprints

    if groups is None:
        groups = fingerprints(docs).select(
            "doc_id", F.col("fp").alias("group_id")
        )
    keyed = (
        docs.select("doc_id")
        .join(groups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("group_id"), F.col("doc_id").cast("string")
            ).alias("group_id"),
        )
    )
    return hash_split(keyed, "group_id", test_fraction, salt)


def dup_downweight(
    docs: DataFrame,
    salt: str = "dupdw",
    groups: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, group_n, kept) — frequency-based SOFT dedup: keep each
    member of a duplicate group independently with probability 1/n
    (n = group size), so a group contributes ONE document in
    expectation regardless of how many copies exist.  The standard
    alternative to hard keep-one dedup when duplicate frequency itself
    carries signal (common pages are mildly upweighted relative to
    keep-one, heavily downweighted relative to keep-all) — the
    frequency-aware downsampling step in large-corpus recipes.

    Groups default to the exact-dedup fingerprint
    (:func:`text.fingerprints`); pass ``groups`` (doc_id, group_id),
    e.g. near-dup clusters, to downweight semantic duplicates.  The
    contract is ONE group per doc: a doc_id appearing under several
    group_ids is assigned its min(group_id) (ADVICE r14: an unguarded
    left join would emit one output row per mapping, silently
    upweighting that document).

    Determinism (the module's md5-bucket discipline): a doc keeps iff
    u32 · n < 2^32 with u32 = the first 8 hex chars of
    md5(salt|doc_id) as an integer — exact BIGINT comparison, no
    floats, SQL-mirrorable (DuckDB's '0x'||hex cast == Spark's
    conv(hex, 16, 10)).

    100 TB shape: one group-keyed window count (or a pre-aggregated
    broadcast for small group tables) + a per-row hash filter — no
    per-group collection, no skew beyond the group-size histogram the
    exact-dedup pass already revealed."""
    from pyspark.sql import Window

    if groups is None:
        # default grouping is the exact fingerprint — computable inline
        # (text.fingerprints' normalization), so the default path is
        # join-FREE: one map + one group-keyed window shuffle
        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        keyed = docs.select("doc_id", F.md5(norm).alias("group_id"))
    else:
        # enforce the one-group-per-doc contract BEFORE the join: a
        # multi-mapped doc_id takes its min(group_id) deterministically
        # (map-side-combined groupBy — same shuffle key as the join)
        groups = groups.groupBy("doc_id").agg(
            F.min("group_id").alias("group_id")
        )
        keyed = (
            docs.select("doc_id")
            .join(groups, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(
                    F.col("group_id"), F.col("doc_id").cast("string")
                ).alias("group_id"),
            )
        )
    n = F.count(F.lit(1)).over(Window.partitionBy("group_id")).cast("long")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return keyed.select(
        "doc_id",
        n.alias("group_n"),
        (u32 * n < F.lit(2**32).cast("long")).alias("kept"),
    )


def mixture_sample(
    docs: DataFrame,
    token_budgets: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mixture",
) -> DataFrame:
    """Data-mixing: downsample each source to a per-source TOKEN budget
    (the pretraining-mixture shape — "30M web tokens, 10M code
    tokens").  Per source, the keep rate is ``min(1, budget /
    available_tokens)`` and the keep decision is a deterministic md5
    bucket on (salt, key) — reproducible, portable, coordination-free.
    This operator uses an 8-hex-digit (2^32) bucket space rather than
    the module's 4-hex default: mixture rates get genuinely tiny
    (budget / corpus tokens), and the wider space keeps granularity at
    ~2.3e-10 with a floor of one bucket for any positive budget.
    Sources absent from ``token_budgets`` are dropped (budget 0).

    100 TB shape: ONE token-count scan + a tiny per-source aggregate
    (|sources| rows, AQE broadcasts it back) + a stateless per-row
    filter.  Expected sampled tokens per source ≈ budget (binomial
    noise around the rate); no per-row sort, no global pass.

    Returns (key, source, n_tokens) for the kept rows.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    t = docs.select(
        F.col(key_col).alias("key"),
        F.col(source_col).alias("source"),
        toks.alias("n_tokens"),
    )
    totals = t.groupBy("source").agg(F.sum("n_tokens").alias("tot"))
    budget = F.lit(None).cast("double")
    for src, b in sorted(token_budgets.items()):
        budget = F.when(F.col("source") == src, F.lit(float(b))).otherwise(
            budget
        )
    rates = totals.select(
        "source",
        F.least(F.lit(1.0), F.coalesce(budget, F.lit(0.0)) / F.col("tot")).alias(
            "rate"
        ),
    )
    # 8-hex-digit bucket space (2^32 buckets — granularity ~2.3e-10):
    # the module's 4-hex space quantizes the keep rate to 1/65536, and
    # any source with budget/total < 1/65536 would floor to threshold 0
    # and silently emit NOTHING (at real mixture scales — a 1M-token
    # budget over a 10^11-token source — that triggers).  The threshold
    # is also ceiled to 1 bucket whenever budget > 0, so a positive
    # budget always has a nonzero keep probability; rate >= 1 keeps
    # everything (its threshold would overflow the digit width, which
    # string-compares wrong).  The bucket index is ALSO clamped to
    # 2^32-1: for a rate just below 1.0 (budget = total-1 at 10^11
    # tokens) rate*2^32 rounds UP to exactly 2^32 in double arithmetic,
    # whose 9-hex form lpad(...,8) would TRUNCATE to '10000000' —
    # collapsing the effective keep rate from ~100% to 1/16
    thr = F.when(
        F.col("rate") > 0,
        F.lower(
            F.lpad(
                F.hex(
                    F.least(
                        F.lit(4294967295).cast("bigint"),
                        F.greatest(
                            F.lit(1).cast("bigint"),
                            F.floor(
                                F.col("rate") * F.lit(4294967296.0)
                            ).cast("bigint"),
                        ),
                    )
                ),
                8,
                "0",
            )
        ),
    ).otherwise(F.lit("00000000"))
    b8 = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col("key").cast("string"))),
        1,
        8,
    )
    return (
        t.join(rates, "source")
        .filter((F.col("rate") >= 1.0) | (b8 < thr))
        .select("key", "source", "n_tokens")
    )


def temperature_quota_sample(
    docs: DataFrame,
    budget: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled mixture with EXACT per-source quotas: the
    multilingual/multi-source re-balancing step (XLM-R / mBERT
    exponent-smoothing: sample source s ∝ n_s^α with α < 1 so rare
    sources are upweighted) at the fixed smoothing α = 0.5, which is
    the one temperature with an EXACT integer weight — w_s =
    isqrt(n_s) — so quotas are bit-identical across engines (general α
    needs float pow, whose last-ulp differences can flip a
    largest-remainder tie).

    Quotas: q_s = floor(budget·w_s / Σw) with the leftover distributed
    by LARGEST REMAINDER ((budget·w_s) mod Σw, ties on source asc) —
    exact BIGINT arithmetic end to end — then capped at n_s (an
    exhausted source simply contributes everything it has; the total
    can undershoot ``budget`` in that case, which is reported honestly
    rather than silently re-flowed).  isqrt uses the ±1 fix-up after
    floor(sqrt(double)) so perfect-square boundaries can't mis-weight
    above 2^26 rows per source.

    Selection within a source is the module's deterministic md5 order:
    rank by (md5(salt|key), key), keep rank ≤ quota — reproducible,
    portable, and a DuckDB oracle replays it verbatim.

    Returns (key, source) of the sampled rows.

    100 TB shape: per-source counts are ONE map-side-combined
    aggregate; all quota arithmetic happens on the |sources|-sized
    frame (broadcast back); selection is one window per source
    partition — a single shuffle on the source key.  No driver-side
    math, no float anywhere."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    t = docs.select(
        F.col(key_col).alias("key"), F.col(source_col).alias("source")
    )
    counts = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    r0 = F.floor(F.sqrt(F.col("n_s").cast("double"))).cast("bigint")
    # isqrt fix-up: double sqrt can land one off near perfect squares
    w = (
        r0
        - F.when(r0 * r0 > F.col("n_s"), F.lit(1)).otherwise(F.lit(0))
        + F.when(
            (r0 + 1) * (r0 + 1) <= F.col("n_s"), F.lit(1)
        ).otherwise(F.lit(0))
    ).cast("bigint")
    weighted = counts.select("source", "n_s", w.alias("w_s"))
    tot = weighted.agg(F.sum("w_s").alias("__W"))
    q = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.expr(f"CAST({budget} AS BIGINT) * w_s div __W").alias("__q0"),
            F.expr(f"pmod(CAST({budget} AS BIGINT) * w_s, __W)").alias(
                "__rem"
            ),
        )
    )
    from pyspark.sql import Window

    lo = q.agg(
        (F.lit(budget).cast("bigint") - F.sum("__q0")).alias("__leftover")
    )
    rk = Window.orderBy(F.desc("__rem"), F.asc("source"))
    quotas = (
        q.crossJoin(F.broadcast(lo))
        .withColumn("__rk", F.row_number().over(rk))
        .select(
            "source",
            F.least(
                F.col("n_s"),
                F.col("__q0")
                + F.when(
                    F.col("__rk") <= F.col("__leftover"), F.lit(1)
                ).otherwise(F.lit(0)),
            ).cast("bigint").alias("quota"),
        )
    )
    sel = Window.partitionBy("source").orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col("key").cast("string"))),
        F.asc("key"),
    )
    return (
        t.join(F.broadcast(quotas), "source")
        .withColumn("__sel", F.row_number().over(sel))
        .filter(F.col("__sel") <= F.col("quota"))
        .select("key", "source")
    )
