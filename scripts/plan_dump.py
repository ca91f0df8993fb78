"""Dump ``.explain("formatted")`` for declared query keys to
``plans/r16/<key>_<tag>.txt`` (the optimization-round evidence files).

Usage::

    python scripts/plan_dump.py <tag> [key ...]     # default: all keys

``SPARK_GRAFT_SF_DIR`` picks the fixture (default sf0.01 — plan shape,
not data scale, is what the files pin).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pg_age_digitaltwins_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"),
)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: plan_dump.py <tag> [key ...]", file=sys.stderr)
        return 2
    tag = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    rc = 0
    final = bool(os.environ.get("SPARK_GRAFT_PLAN_FINAL"))
    for k in keys or sorted(qs):
        try:
            df = qs[k](spark, SF_DIR)
            if final:
                # r17 (ADVICE): execute THIS query execution first so
                # the dumped plan is the final adaptive plan
                # (isFinalPlan=true, AQEShuffleRead / ReusedExchange
                # visible) instead of the pre-AQE initial plan
                df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(OUT_DIR, f"{k}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{k} -> {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
