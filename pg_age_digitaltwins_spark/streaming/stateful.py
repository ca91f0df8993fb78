"""Stateful Structured Streaming operators over the events stream.

The reference has NO watermarks/windows/sessionization (SURVEY §2.4
"streaming semantics notes" — delivery is transaction-ordered batching
only), so these are beyond-reference extensions: the windowed/stateful
operators a training-data or telemetry pipeline needs when the change
feed becomes a real stream.

Design notes for 100 TB/day streams:
* Aggregations are keyed (event_type / user_id) so state partitions by
  the shuffle key; watermarks bound state size — late rows past the
  watermark are dropped instead of growing state forever.
* ``session_window`` / ``window`` are JVM built-ins (whole-stage state
  store ops).  ``applyInPandasWithState`` is reserved for the one
  operator Spark genuinely can't express declaratively (the deadband
  filter, which must remember the last *emitted* value per key — not
  the last seen — across micro-batches).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F, types as T


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per (hour, event_type) count/sum with late-data handling: rows
    later than ``watermark`` are dropped and their windows finalized.
    Batch equivalent: ``operators.events.hourly_rollup``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user as a stream: the native
    ``session_window`` state op merges/extends sessions across
    micro-batches and closes them ``gap_minutes`` after the last event
    (batch equivalent: ``operators.events.sessionize``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


DEADBAND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("prev_emitted", T.DoubleType()),
    ]
)

_DEADBAND_STATE = T.StructType([T.StructField("last", T.DoubleType())])


def deadband_filter(events: DataFrame, threshold: float = 5.0) -> DataFrame:
    """IoT deadband/report-by-exception: per key, emit an event only
    when its value moved ≥ ``threshold`` from the LAST EMITTED value
    (first event per key always emits).

    This is genuinely custom state — the comparison point is the last
    *emitted* value, which no built-in aggregate tracks — so it uses
    ``applyInPandasWithState`` (Arrow-batched, state partitioned by the
    grouping key, scales with the key cardinality not the event count).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterable, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else None
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for r in pdf.itertuples(index=False):
                v = float(r.value)
                if last is None or abs(v - last) >= threshold:
                    out_rows.append((key[0], r.ts, v, last))
                    last = v
        state.update((last,))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["user_id", "ts", "value", "prev_emitted"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=DEADBAND_SCHEMA,
        stateStructType=_DEADBAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedupe_within_watermark(
    events: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once feed → effectively-once delivery: drop redelivered
    events by id within the watermark horizon.

    The change feed (like the reference's WAL consumption,
    ``AgeDigitalTwinsReplication.cs:536-540`` LSN acks) is
    at-least-once — a crash between delivery and checkpoint replays the
    tail.  ``dropDuplicatesWithinWatermark`` keeps per-id state ONLY
    until the watermark passes it (bounded state — a plain
    ``dropDuplicates`` on a stream grows state forever), which is
    exactly the redelivery window's shape: duplicates arrive close to
    the original, never later than the replayed checkpoint gap.
    """
    id_cols = id_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("cusum_milli", T.LongType()),
        T.StructField("flagged", T.BooleanType()),
    ]
)

_CUSUM_STATE = T.StructType([T.StructField("dev", T.LongType())])


HH_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("count_est", T.LongType()),
        T.StructField("overcount", T.LongType()),
    ]
)

_HH_STATE = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("overs", T.ArrayType(T.LongType())),
    ]
)


def streaming_heavy_hitters(
    events: DataFrame, capacity: int = 16
) -> DataFrame:
    """Streaming TOP-K (heavy hitters) per event_type: a Space-Saving
    summary (Metwally-Agrawal-El Abbadi) over ``user_id`` maintained
    ACROSS micro-batches — the bounded-memory answer to "who are the
    top users right now" when the key cardinality is unbounded.  After
    each batch the key's CURRENT summary is emitted: (user_id,
    count_est, overcount), with the Space-Saving guarantees
    (count_est ≥ true count ≥ count_est − overcount; any key with true
    count > N/capacity is IN the summary).

    Third genuine ``applyInPandasWithState`` operator (after the
    deadband filter and the CUSUM monitor), and VECTORIZED like the
    CUSUM monitor: each batch pre-aggregates to per-user counts
    (``value_counts`` summed across ALL Arrow chunks, so the summary
    is independent of the ~10k-row chunk boundaries), existing summary keys absorb their
    batch count in one dict update, and only NEW keys walk the
    O(capacity) eviction — cost O(distinct + new·capacity) per batch,
    never per-row Python.  Aggregated increments preserve the
    Space-Saving error bound (count_est ≥ true ≥ count_est −
    overcount holds under any increment schedule: an existing key adds
    exact occurrences; an evicting key inherits the evicted minimum as
    its overcount).  Determinism: new keys apply in (−batch_count,
    user_id) order and evictions pick the lexicographic minimum
    (count, user_id) — replay-stable, no hash-order dependence.
    State per key = three bounded arrays (≤ capacity entries), so
    state size is |event types| · capacity regardless of stream
    length — the property that makes this safe at 100 TB/day where an
    exact per-user count table would grow without bound."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def fn(key, pdfs: Iterable, state: GroupState):
        import pandas as pd

        if state.exists:
            keys, counts, overs = (
                list(state.get[0]), list(state.get[1]), list(state.get[2])
            )
        else:
            keys, counts, overs = [], [], []
        summary = {
            k: (c, o) for k, c, o in zip(keys, counts, overs)
        }
        # aggregate value_counts across ALL Arrow chunks FIRST, then
        # apply one update + eviction pass per BATCH — pdfs is an
        # iterator of ~10k-row Arrow chunks, and per-chunk eviction
        # would make the summary chunk-boundary-dependent (ADVICE r14:
        # the determinism/replay claim must hold at any chunking)
        batch = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            vc = pdf["user_id"].astype("int64").value_counts()
            batch = vc if batch is None else batch.add(vc, fill_value=0)
        if batch is not None:
            fresh = []
            for uid, n in batch.items():
                uid, n = int(uid), int(n)
                if uid in summary:
                    c, o = summary[uid]
                    summary[uid] = (c + n, o)
                else:
                    fresh.append((uid, n))
            # new keys in deterministic (-count, key) order; only these
            # pay the O(capacity) eviction scan
            for uid, n in sorted(fresh, key=lambda t: (-t[1], t[0])):
                if len(summary) < capacity:
                    summary[uid] = (n, 0)
                else:
                    evict = min(summary, key=lambda k: (summary[k][0], k))
                    m = summary[evict][0]
                    del summary[evict]
                    summary[uid] = (m + n, m)
        items = sorted(summary.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [k for k, _ in items],
            [c for _, (c, _) in items],
            [o for _, (_, o) in items],
        ))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "user_id": [k for k, _ in items],
                "count_est": [c for _, (c, _) in items],
                "overcount": [o for _, (_, o) in items],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=HH_SCHEMA,
        stateStructType=_HH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum_monitor(
    events: DataFrame,
    target: float,
    threshold: float,
    tie_break: str | None = "event_id",
) -> DataFrame:
    """Streaming mean-shift (CUSUM) monitor: per event_type, the
    running deviation D = Σ(value − target) accumulates ACROSS
    micro-batches and every event is emitted with its running CUSUM
    and a flag once |D| ≥ threshold — the online sibling of the batch
    ``operators.events.drift_stats`` (which centers on the full-series
    mean; a stream has no full series, so the reference level is a
    configured ``target``, exactly how production CUSUM monitors run).

    Custom state is genuine here (a running cumulative sum across
    batches is not a built-in streaming aggregate), so this is the
    package's second ``applyInPandasWithState`` operator.  Arithmetic
    is EXACT: values scale to floor-milli BIGINTs on entry and the
    state is one BIGINT per key — deterministic replay, no float
    accumulation drift, state size = |event types|.

    Within each Arrow slice rows order by (ts, ``tie_break``);
    ``tie_break`` must name a column of the input (raises per-batch if
    it doesn't — a silent KeyError mid-stream is worse), or pass None
    for ts-only ordering on streams without a tie-break column.  Null
    and NaN values are skipped (they carry no deviation).

    100 TB/day shape: state partitions by event_type; per batch each
    key does ONE sorted VECTORIZED pass over its Arrow slice (the
    running CUSUM is a prefix sum — floor-milli deltas then cumsum,
    all int64 numpy, bit-identical to a per-row walk); emission is
    append-mode (no unbounded result table)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mu_milli = int(target * 1000)
    h_milli = int(threshold * 1000)
    sort_cols = ["ts"] + ([tie_break] if tie_break else [])

    def fn(key, pdfs: Iterable, state: GroupState):
        import numpy as np
        import pandas as pd

        dev = state.get[0] if state.exists else 0
        frames = []
        for pdf in pdfs:
            missing = [c for c in sort_cols if c not in pdf.columns]
            if missing:
                raise ValueError(
                    f"streaming_cusum_monitor: tie-break column(s) "
                    f"{missing} not in the input stream — pass "
                    f"tie_break=None or name an existing column"
                )
            pdf = pdf.sort_values(sort_cols)
            pdf = pdf[pdf["value"].notna()]
            if pdf.empty:
                continue
            vals = pdf["value"].to_numpy(dtype=np.float64)
            # floor-milli BIGINT deltas, then prefix-sum — identical
            # integers to the former per-row walk, vectorized
            deltas = np.floor(vals * 1000.0).astype(np.int64) - mu_milli
            cusum = dev + np.cumsum(deltas)
            dev = int(cusum[-1])
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": key[0],
                        "ts": pdf["ts"].reset_index(drop=True),
                        "value": vals,
                        "cusum_milli": cusum,
                        "flagged": np.abs(cusum) >= h_milli,
                    }
                )
            )
        state.update((dev,))
        for f in frames:
            yield f

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _band_keys(docs: DataFrame, num_hashes: int, bands: int, n: int) -> DataFrame:
    """(doc_id, band, bhash) MinHash-LSH band keys — PURE per-row maps
    (shingle → fold-signature → sliced band hashes), so the pipeline is
    legal on a stream; identical arithmetic to the batch
    ``similarity.minhash_lsh_pairs`` banding."""
    from pg_age_digitaltwins_spark.operators.similarity import (
        minhash_signatures,
    )
    from pg_age_digitaltwins_spark.operators.text import ngram_shingles

    sigs = minhash_signatures(ngram_shingles(docs, n=n), num_hashes=num_hashes)
    rpb = max(1, num_hashes // bands)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice("sig", b * rpb + 1, rpb)).alias("bhash"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.bhash").alias("bhash"),
    )


def near_dup_gate(
    corpus_docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
):
    """Build a per-batch near-dup gate against a STATIC reference
    corpus: returns ``gate(batch_df) -> batch_df`` dropping documents
    whose MinHash band signature collides with the corpus — the
    incremental-ingest dedup filter (new crawl batches vs the curated
    training set; the decontamination shape with a benchmark corpus).

    The corpus band index is computed ONCE (lazy localCheckpoint,
    materialized on first use) and is (band, bhash)-narrow; per batch
    the gate runs one LEFT SEMI collision probe + one LEFT ANTI on
    doc_id — identical band arithmetic to the batch
    ``minhash_lsh_pairs``, so stream and batch agree on what collides.
    Candidate-level verification (exact Jaccard) stays a batch concern;
    this gate is the recall-oriented first pass, like every LSH stage
    in the package."""
    corpus_keys = (
        _band_keys(corpus_docs, num_hashes, bands, n)
        .select("band", "bhash")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def gate(batch_df: DataFrame) -> DataFrame:
        hit_ids = (
            _band_keys(batch_df, num_hashes, bands, n)
            .join(corpus_keys, ["band", "bhash"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        return batch_df.join(hit_ids, "doc_id", "left_anti")

    return gate


def streaming_near_dup_filter(
    docs_stream: DataFrame,
    corpus_docs: DataFrame,
    sink,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    checkpoint: str | None = None,
):
    """Run the near-dup gate over a document STREAM via
    ``foreachBatch`` (a batch-side anti join per micro-batch — Spark
    does not support stream-stream LEFT ANTI, and each micro-batch is
    a static frame where the exact join semantics are legal; this is
    the standard escape hatch the Structured Streaming guide
    prescribes for unsupported join shapes).

    ``sink(survivors_df, batch_id)`` receives each batch's surviving
    documents.  Returns the started StreamingQuery (caller awaits)."""
    gate = near_dup_gate(corpus_docs, num_hashes=num_hashes, bands=bands, n=n)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(gate(batch_df), batch_id)

    writer = docs_stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
