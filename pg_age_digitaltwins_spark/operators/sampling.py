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
