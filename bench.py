"""Headline benchmark: representative queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <dir>}

Execution is forced with the noop sink (full pipeline runs, no
collect/transfer cost measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pg_age_digitaltwins_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "adt_is_of_model_inheritance",
    "adt_rel_prop_filter",
    "adt_join_related_2hop",
    "adt_match_3hop",
    "agg_twins_by_model",
    "tpch_pricing_summary",
    "tpch_revenue_by_nation",
    "events_sessionize",
    "text_token_counts",
    "text_fingerprints",
    "dedup_minhash_lsh",
    "embed_knn_topk",
]


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # Warm the store (twin/relationship plan construction is shared).
    qs["adt_count_twins"](spark, SF_DIR).count()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
