"""Audit Spark-vs-DuckDB output dtype CLASSES for every oracled key.

The driver's correctness gate hashes values exactly, so a column that is
BIGINT on the Spark side but comes out of DuckDB as float64 (the classic
cause: DuckDB ``sum(BIGINT)`` returns HUGEINT, which pandas converts to
float64) hash-mismatches even when the values are numerically identical.
``scripts/oracle_check.py``'s float tolerance hides exactly this class of
bug — this audit closes the hole by comparing dtype classes, using the
LAZY Spark schema (no job runs for most keys).

Usage::

    python scripts/dtype_audit.py [key ...]   # default: all oracled keys
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from pyspark.sql import SparkSession
from pyspark.sql import types as T

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_INT = "int"
_FLOAT = "float"
_STR = "str"
_TS = "ts"
_DATE = "date"
_BOOL = "bool"
_OTHER = "other"


def spark_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return _INT
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return _FLOAT
    if isinstance(dt, T.StringType):
        return _STR
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _TS
    if isinstance(dt, T.DateType):
        return _DATE
    if isinstance(dt, T.BooleanType):
        return _BOOL
    return _OTHER


def pandas_class(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return _BOOL
    if pd.api.types.is_integer_dtype(s):
        return _INT
    if pd.api.types.is_float_dtype(s):
        return _FLOAT
    if pd.api.types.is_datetime64_any_dtype(s):
        return _TS
    if pd.api.types.is_object_dtype(s):
        # DuckDB dates come through as object(datetime.date) or dbdate;
        # strings as object.  Sample a non-null value.
        nn = s.dropna()
        if len(nn):
            v = nn.iloc[0]
            if isinstance(v, str):
                return _STR
            import datetime
            import decimal
            if isinstance(v, datetime.datetime):
                return _TS
            if isinstance(v, datetime.date):
                return _DATE
            if isinstance(v, decimal.Decimal):
                return _FLOAT
            if isinstance(v, int):
                return _INT
            if isinstance(v, float):
                return _FLOAT
        return _STR
    return _OTHER


def main() -> int:
    keys = sys.argv[1:] or None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("dtype-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    todo = keys or [k for k in queries if k in oracles]
    bad = []
    errs = []
    for k in todo:
        if k not in oracles:
            continue
        try:
            sdf = queries[k](spark, SF_DIR)
            s_classes = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            errs.append((k, f"spark: {e}"))
            continue
        try:
            # LIMIT 0-free: we need real values for object-dtype probing,
            # but only a handful of rows.
            odf = con.execute(oracles[k]).df()
        except Exception as e:  # noqa: BLE001
            errs.append((k, f"duckdb: {e}"))
            continue
        o_classes = {c: pandas_class(odf[c]) for c in odf.columns}
        if set(s_classes) != set(o_classes):
            bad.append((k, f"columns differ: spark={sorted(s_classes)} "
                           f"oracle={sorted(o_classes)}"))
            continue
        for c in s_classes:
            sc, oc = s_classes[c], o_classes[c]
            if sc != oc:
                # empty object columns default to _STR; skip all-null cols
                if odf[c].isna().all():
                    continue
                # nullable-int parity: a Spark BIGINT with nulls ALSO
                # becomes float64 under toPandas, so an oracle float
                # column that actually contains NaNs is consistent with
                # a lazy Spark int schema — the dangerous case is a
                # NaN-free oracle float (HUGEINT leak) vs Spark int
                if sc == _INT and oc == _FLOAT and odf[c].isna().any():
                    print(f"WARN {k}: column {c!r} int-with-nulls "
                          f"(floats on both sides after toPandas)")
                    continue
                bad.append((k, f"column {c!r}: spark={sc} oracle={oc}"))
    for k, msg in errs:
        print(f"ERR  {k}: {msg}")
    for k, msg in bad:
        print(f"BAD  {k}: {msg}")
    print(f"\n{len(todo)} keys audited, {len(bad)} dtype mismatches, "
          f"{len(errs)} errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
