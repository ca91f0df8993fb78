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


def bench_cdc_throughput(
    spark, n_commits: int = 20, events_per_commit: int = 500
) -> dict:
    """Streaming-pipeline throughput: N synthetic commits tailed from a
    commit-log root through the full CDC pipeline (readStream →
    coalesce → CloudEvents format → route → ND-JSON lake sink,
    executor-side delivery).  Batch keys can't see a regression here —
    this records events/sec for the S1-S14 path."""
    import shutil
    import tempfile
    import uuid

    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog,
        _stage_events_list,
    )
    from pg_age_digitaltwins_spark.streaming.changes import EventData
    from pg_age_digitaltwins_spark.streaming.sinks import (
        EventRoute,
        EventRouter,
        NdjsonDirSink,
        run_change_stream,
    )

    work = tempfile.mkdtemp(prefix="cdc-bench-")
    try:
        root = os.path.join(work, "tbl")
        log = CommitLog(root)
        seq = 0
        for v in range(1, n_commits + 1):
            events = []
            for _ in range(events_per_commit):
                seq += 1
                doc = {
                    "$dtId": f"t{seq}",
                    "$metadata": {"$model": "dtmi:bench:Thing;1"},
                    "x": seq,
                }
                events.append(
                    EventData(
                        entity_id=f"t{seq}", graph_name="g",
                        table_name="Twin", old_value=None, new_value=doc,
                        event_type="Insert",
                        timestamp="2026-01-01T00:00:00.000", txn_id=v,
                        seq=seq,
                    )
                )
            tag = f"{v:020d}"
            stage = os.path.join(log.changes_dir, f".stage-{uuid.uuid4().hex[:8]}")
            _stage_events_list(events, stage)
            log.try_commit(
                v,
                {"version": v, "base_version": v - 1, "format": 2,
                 "data_dir": None, "tables": {},
                 "change_dir": os.path.join("changes", tag),
                 "n_events": len(events), "writer": "bench"},
            )
            os.rename(stage, os.path.join(root, "changes", tag))

        router = EventRouter(source="bench-cdc")
        lake = NdjsonDirSink(os.path.join(work, "lake"), name="lake")
        router.add_sink(lake)
        router.add_route(EventRoute("lake", "EventNotification"))
        total = n_commits * events_per_commit
        t0 = time.perf_counter()
        q = run_change_stream(
            spark, root, router, os.path.join(work, "ckpt")
        )
        q.awaitTermination(300)
        wall = time.perf_counter() - t0
        # delivered = lifecycle creates, one per distinct entity
        delivered = spark.read.json(os.path.join(work, "lake")).count()
        return {
            "events": total,
            "delivered": int(delivered),
            "wall_sec": round(wall, 3),
            "events_per_sec": round(total / wall, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # Warm the store (twin/relationship plan construction is shared).
    qs["adt_count_twins"](spark, SF_DIR).count()
    # Per-key MIN over N passes: one pass mixes plan-compilation warmup
    # and co-tenant noise into every key; the min is the steady-state
    # cost of the PLAN (what a scale-up multiplies).  Runs/agg are
    # recorded in the output so the number is self-describing.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for _ in range(runs):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            if name not in timings or wall < timings[name]:
                timings[name] = wall
    total = round(sum(timings.values()), 3)
    cdc = bench_cdc_throughput(spark)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "agg": "min",
                "cdc": cdc,
                "sf": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
