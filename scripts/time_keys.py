"""Time individual declared query keys with the noop sink (guide §1.4)
— the per-key isolation harness for the optimization rounds.

Usage::

    python scripts/time_keys.py <sf_dir> <runs> key [key ...]

Prints one line per (key, pass) plus a min summary; jobs are labelled
via setJobDescription so the UI/event log stays readable (guide §1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pg_age_digitaltwins_spark import get_spark


def main() -> int:
    sf_dir, runs, keys = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    spark = get_spark("time-keys")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # warm the store cache once so key timings exclude the one-time build
    qs["adt_count_twins"](spark, sf_dir).count()
    out: dict[str, list[float]] = {}
    for r in range(runs):
        for k in keys:
            import gc

            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"{k} pass {r}")
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            out.setdefault(k, []).append(wall)
            print(f"{k} pass{r}: {wall}", flush=True)
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in out.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
