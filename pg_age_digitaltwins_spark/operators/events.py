"""Event-stream analytics (batch shape of the streaming pipeline).

The reference's event pipeline is transaction-ordered delivery with no
event-time windowing (SURVEY.md §2.4 notes).  These operators are the
*batch* equivalents we expose for the events table; the streaming
module reuses the same column logic under ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type: count + sum(value).

    groupBy on (hour, type) → map-side partial agg then one shuffle;
    at scale, pre-partitioning the table by date makes this a
    partition-local agg."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def hopping_rollup(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding (hopping) window rollup per event type: count + sum over
    overlapping windows — ``F.window(ts, window, slide)``.

    Spark expands each event into window/slide assignment rows (2 here)
    BEFORE the partial aggregation, so the shuffle still carries only
    (window, type) partials — the standard streaming-compatible shape:
    the identical expression runs under ``readStream`` with a watermark
    for the late-data path.  Output columns are the window START (the
    stable, oracle-checkable key) plus the aggregate."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window, slide).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def last_value_per_user_type(events: DataFrame) -> DataFrame:
    """Latest event value per (user, event_type) — the DataHistory
    'current property value' question (SURVEY.md §2.4 S7).

    Window + row_number: one shuffle on the partition keys; ties broken
    by event_id so the result is deterministic."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("value").alias("last_value"))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds ``gap_minutes``.

    Classic two-window formulation (lag → flag → running sum) — one
    shuffle on user_id; Structured Streaming gets the same semantics
    from ``session_window`` (see streaming module)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_id = events.withColumn(
        "session_seq", F.sum(new_session).over(w)
    )
    return with_id.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def asof_join_latest_event(
    left: DataFrame,
    events: DataFrame,
    left_ts: str,
    left_key: str,
    event_key: str = "user_id",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """AS-OF join: for each left row, the most recent event at or before
    ``left_ts`` for the matching key.  ``tolerance_seconds`` (r11, the
    standard kdb/pandas ``merge_asof`` knob) bounds the lookback: a
    match older than the tolerance is returned as NULL instead —
    integer-microsecond comparison, no float time math.

    Implemented as union + window (the scalable shape: one shuffle on
    the key, no range cross-join): tag both sides, sort by time within
    key with events winning ties (inclusive "at or before"), carry the
    last event forward with ``last(ignorenulls)``, keep the left rows.

    Both sides ride through ONE pipeline as structs — no row-id
    round-trip join (a previous version paired rows back via
    ``monotonically_increasing_id`` computed on two plan branches,
    which is not stable across stage layouts and silently mis-joined)."""
    lf_struct = F.struct(*[F.col(c) for c in left.columns])
    ev_struct = F.struct(*[F.col(c) for c in events.columns])
    ev = events.select(
        F.col(event_key).alias("__k"),
        F.col("ts").alias("__t"),
        F.lit(0).alias("__side"),
        ev_struct.alias("__event"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("__left"),
    )
    ev_struct_t = ev.schema["__event"].dataType
    lf = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(ev_struct_t).alias("__event"),
        lf_struct.alias("__left"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ev.unionByName(lf).withColumn(
        "__last_event", F.last("__event", ignorenulls=True).over(w)
    )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__last_t",
            F.last(
                F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
            ).over(w),
        ).withColumn(
            "__last_event",
            F.when(
                F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__last_t"))
                <= int(tolerance_seconds) * 1_000_000,
                F.col("__last_event"),
            ),
        )
    return (
        out.filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__left.{c}").alias(c) for c in left.columns], "__last_event"
        )
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of ``value`` per event type — the ops-dashboard
    staple.  Uses EXACT ``percentile`` (linear interpolation, matching
    ANSI ``percentile_cont``), not ``percentile_approx``: the group
    count here is tiny (one row per event type) so exactness is free;
    at 100 TB with high-cardinality groups swap in
    ``percentile_approx`` and accept the documented error bound.
    One shuffle on the group key, map-side partials."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def funnel(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered-funnel conversion: per step, how many users performed the
    whole prefix IN ORDER (each step strictly after the previous one's
    first occurrence).  The product-analytics staple.

    Shape at scale: one shuffle per step keyed on ``user_id``, each
    stage a filtered min-aggregate joined to the previous stage's
    survivors — every join is user-keyed equi-join (no window over the
    whole stream, no per-user collect).
    """
    steps = steps or ["view", "click", "purchase"]
    prev = None  # (user_id, t_prev)
    out_rows = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col("event_type") == step).select("user_id", "ts")
        if prev is None:
            stage = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            stage = (
                ev.join(prev, "user_id")
                .filter(F.col("ts") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        prev = stage
        out_rows.append(
            stage.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).cast("bigint").alias("users"),
            )
        )
    out = out_rows[0]
    for df in out_rows[1:]:
        out = out.unionByName(df)
    return out

def daily_retention(events: DataFrame) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the date of
    their FIRST event (cohort), counted on each later day they return.
    Output: (cohort_date, day_offset, n_users) with day_offset 0 = the
    cohort's own first day.

    100 TB shape: both aggregations shuffle on ``user_id`` first (the
    cohort min and the active-day distinct reuse one partitioning);
    the cohort⋈activity join is user-keyed, and the final rollup's key
    space is tiny (days × offsets), so the last exchange is a few
    thousand rows regardless of event volume.
    """
    day = F.col("ts").cast("date")
    cohorts = events.groupBy("user_id").agg(F.min(day).alias("cohort_date"))
    active = events.select("user_id", day.alias("d")).distinct()
    return (
        active.join(cohorts, "user_id")
        .select(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )

def anomalies_zscore(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Events whose value deviates more than ``threshold`` sample
    standard deviations from their event type's mean — the streaming
    ops staple, run batch-side.

    100 TB shape: the per-type moments are a map-side-combined
    aggregate producing one tiny row per event type; that dimension
    broadcasts back onto the stream, so the detector costs one scan +
    one broadcast join — no shuffle of the event rows at all.
    """
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("__mean"), F.stddev("value").alias("__std")
    )
    z = (F.col("value") - F.col("__mean")) / F.col("__std")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > threshold)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 3).alias("z"),
        )
    )

def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-type inter-arrival gaps: for each (user, type) stream the
    microsecond gap between consecutive events (deterministic tiebreak
    on event_id), rolled up to count/avg/max per type — the cadence
    profile behind sessionization thresholds and SLA alerts.

    100 TB shape: ONE shuffle keyed (user_id, event_type) for the lag
    window, then a map-side-combined rollup onto a handful of type
    rows.  Gaps stay exact integers until the final division, so the
    aggregate is summation-order-proof.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = events.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.sum("gap") / F.count(F.lit(1)).cast("double"), 2).alias(
            "avg_gap_us"
        ),
        F.max("gap").alias("max_gap_us"),
    )


def time_in_state(events: DataFrame) -> DataFrame:
    """Per-user state-duration profile: treat each event as entering
    state ``event_type``; the time in that state is the gap to the
    user's NEXT event (the final state of each user is open-ended and
    excluded).  Rolled up per state to (n_intervals, total/avg seconds)
    — the reference's DataHistory consumers compute exactly this
    "property transition duration" shape downstream of the per-property
    explode (`streaming/cloudevents.py`); here it is an offline
    operator over the event log.

    100 TB shape: ONE shuffle keyed user_id for the lead window, then a
    map-side-combined rollup onto one row per state.  Gaps stay exact
    integer microseconds until the final division."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    spans = events.select(
        "event_type", (F.lead(us).over(w) - us).alias("span_us")
    ).filter(F.col("span_us").isNotNull())
    return spans.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        # exact integer micros first (order-independent, oracle-safe);
        # human-readable seconds ride along as derived doubles
        F.sum("span_us").alias("total_us"),
        F.round(F.sum("span_us") / F.lit(1e6), 6).alias("total_sec"),
        F.round(
            (F.sum("span_us") / F.count(F.lit(1))) / F.lit(1e6), 6
        ).alias("avg_sec"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bin_minutes: int = 60,
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Interval (range) join: every ``points`` row paired with every
    ``intervals`` row whose ``[start_col, end_col]`` contains its
    ``point_ts`` (bounds inclusive).

    Spark's native plan for a pure range predicate is a broadcast
    nested loop (or worse, a cartesian) — quadratic at corpus scale.
    This is the BUCKETED strategy every interval-join engine uses:
    bin the time axis at ``bin_minutes``, send each point to its ONE
    bin, explode each interval to its covered bins, equi-join on the
    bin key (one shuffle, hash join), then apply the exact predicate.
    A point's single bin meets each covering interval exactly once, so
    no dedup is needed.

    100 TB shape: one shuffle keyed by the bin; the interval side
    grows by (interval length / bin width) — pick ``bin_minutes`` near
    the median interval length so neither fan-out nor per-bin skew
    dominates (hot bins are AQE skew-join territory).

    ``max_bins_per_interval`` guards the explode: one corrupted interval
    (a year-9999 ``end_col``) would otherwise expand to a multi-million
    element ``sequence`` per row and die as an opaque executor OOM —
    the same hazard the Cypher allShortestPaths per-pair cap guards.
    Bins are FLOOR-based (not cast-truncation) so pre-1970 timestamps
    bin identically to SQL engines' floor-division semantics."""
    sec = bin_minutes * 60
    p = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(point_ts) / sec).cast("long")
    )
    lo_bin = F.floor(F.unix_timestamp(start_col) / sec).cast("long")
    hi_bin = F.floor(F.unix_timestamp(end_col) / sec).cast("long")
    n_bins = hi_bin - lo_bin + F.lit(1)
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                lo_bin,
                # r12 (ADVICE): cap the per-interval bin fan-out with a
                # CLEAR runtime error naming the interval instead of an
                # executor OOM / array-cap failure on corrupt bounds.
                F.when(
                    F.assert_true(
                        n_bins <= F.lit(max_bins_per_interval),
                        F.concat(
                            F.lit("range_join(): interval ["),
                            F.col(start_col).cast("string"),
                            F.lit(", "),
                            F.col(end_col).cast("string"),
                            F.lit("] spans "),
                            n_bins.cast("string"),
                            F.lit(
                                " bins, above the "
                                f"{max_bins_per_interval} per-interval cap; "
                                "raise bin_minutes, filter corrupt "
                                "intervals, or raise max_bins_per_interval"
                            ),
                        ),
                    ).isNull(),
                    hi_bin,
                ),
            )
        ),
    )
    return (
        p.join(iv, "__bin")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bin")
    )


def gap_fill_locf(
    events: DataFrame, minutes: int = 60, chunk_buckets: int | None = None
) -> DataFrame:
    """Gap-filled regular time grid with last-observation-carried-forward
    (the hypertable ``time_bucket_gapfill`` + ``locf`` shape): per
    ``event_type``, every ``minutes``-sized bucket between the series'
    first and last observation gets a row — observed buckets carry their
    LAST value (deterministic (ts, event_id) pick, no float math) and
    ``n_events``; empty buckets carry the carried-forward value,
    ``n_events = 0`` and ``is_gap = true``.  The fill resets per series
    (no bleed across event types), and leading gaps stay NULL.

    100 TB shape: one map-side-combined groupBy onto (series, bucket) —
    output is buckets × series, decoupled from event count; the grid
    generates from a series-sized bounds aggregate via ``sequence``
    (no driver loop).  The default LOCF window shuffles grid-sized data
    keyed by the series column — fine while the grid (buckets, not
    events) stays modest, but a years-of-minutes series still sorts in
    ONE task.  ``chunk_buckets=N`` (r16) closes that last
    |series|-parallel window in the family with the segmented-scan
    form of the r16 prefix-sum discipline: per-(series, chunk) LAST
    observed value → exclusive carried-in value windowed over the TINY
    chunk dim → broadcast back → within-chunk LOCF windows +
    ``coalesce`` — parallelism series × chunks, results identical for
    ANY chunk size (last-non-null is associative over ordered
    segments; the chunk fn is monotone in bucket_id)."""
    from pyspark.sql import Window

    sec = minutes * 60
    order = F.struct(F.col("ts"), F.col("event_id"))
    obs = events.groupBy(
        "event_type",
        # r12 (ADVICE): FLOOR, not cast-truncation — truncation rounds
        # toward zero, so pre-1970 timestamps would land one bucket
        # late vs the floor-division semantics SQL engines use.
        F.floor(F.unix_timestamp("ts") / sec).cast("long").alias("bucket_id"),
    ).agg(
        F.max_by("value", order).alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    # checkpoint the bucket aggregate: both the grid bounds and the
    # fill join consume it — without the cut the raw event scan (the
    # 100 TB side) runs twice; obs is buckets × series, tiny
    ).localCheckpoint(eager=False)
    bounds = obs.groupBy("event_type").agg(
        F.min("bucket_id").alias("lo"), F.max("bucket_id").alias("hi")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("bucket_id")
    )
    out_cols = lambda filled, locf: filled.select(  # noqa: E731
        "event_type",
        F.timestamp_seconds(F.col("bucket_id") * sec).alias("bucket"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        locf.alias("value_locf"),
        F.col("last_value").isNull().alias("is_gap"),
    )
    if chunk_buckets is None:
        w = (
            Window.partitionBy("event_type")
            .orderBy("bucket_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return out_cols(
            grid.join(obs, ["event_type", "bucket_id"], "left"),
            F.last("last_value", ignorenulls=True).over(w),
        )
    if chunk_buckets <= 0:
        raise ValueError(
            f"chunk_buckets must be positive or None, got {chunk_buckets}"
        )
    filled = (
        grid.join(obs, ["event_type", "bucket_id"], "left")
        .withColumn(
            "__c",
            F.floor(F.col("bucket_id") / F.lit(chunk_buckets)).cast("long"),
        )
        .localCheckpoint(eager=False)
    )
    # chunk dim (series × chunks — tiny): each chunk's LAST observed
    # value, then the exclusive carried-in value from preceding chunks
    dim = filled.groupBy("event_type", "__c").agg(
        F.max_by("last_value", F.when(F.col("last_value").isNotNull(),
                                      F.col("bucket_id"))).alias("__cl")
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("__c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = dim.select(
        "event_type", "__c",
        F.last("__cl", ignorenulls=True).over(wd).alias("__carry_in"),
    )
    wl = (
        Window.partitionBy("event_type", "__c")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = F.coalesce(
        F.last("last_value", ignorenulls=True).over(wl),
        F.col("__carry_in"),
    )
    return out_cols(
        filled.join(F.broadcast(carry), ["event_type", "__c"]), locf
    )


def _cumulative_frame(
    events: DataFrame, scale: int, bucket_minutes: int | None
) -> DataFrame:
    """Shared scaffold for the exact per-series cumulative operators
    (:func:`drift_stats`, :func:`changepoint`): fix ``value`` to
    BIGINT with ``floor(value·scale)`` and return (event_type, ts,
    event_id, __vs, __s, __k, __tot, __cnt) where ``__s`` is the
    running sum and ``__k`` the 1-based rank under the canonical
    (ts, event_id) series order, with the per-series grand totals
    joined on.

    ``bucket_minutes=None`` is the single-window path: ONE shuffle
    keyed by the series column, but each series' entire history sorts
    in ONE task (parallelism = |series| — the r15-probe scale flaw).

    ``bucket_minutes=N`` is the scale path — the textbook two-pass
    distributed prefix sum: (1) aggregate per-(series, time-bucket)
    sums/counts (map-side combined; the dim is series × buckets,
    tiny), (2) window over the DIM to get each bucket's exclusive
    cumulative offset, (3) broadcast-join the offsets back and add a
    within-bucket window partitioned by (series, bucket).  Every
    task sorts one bounded bucket; parallelism = series × buckets.
    Results are IDENTICAL to the global window for ANY bucket size —
    the bucket function is monotone in ts and same-ts rows share a
    bucket, so the (ts, event_id) total order is preserved across
    bucket boundaries — which is why, unlike
    :func:`rolling_stats`'s carry path, no bucket-dimension guard is
    needed and bucketed can be the DEFAULT.  Grand totals fall out
    of the dim for free (no second full scan); the projected input
    is lazily checkpointed so the raw event scan (the 100 TB side)
    materializes once for the dim pass and the main pass."""
    from pyspark.sql import Window

    vs = F.floor(F.col("value") * scale).cast("long")
    df = events.filter(F.col("value").isNotNull()).select(
        "event_type", "ts", "event_id", vs.alias("__vs")
    )
    if bucket_minutes is None:
        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        tot = df.groupBy("event_type").agg(
            F.sum("__vs").alias("__tot"), F.count(F.lit(1)).alias("__cnt")
        )
        return (
            df.withColumn(
                "__s",
                F.sum("__vs").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn("__k", F.row_number().over(w).cast("long"))
            .join(F.broadcast(tot), "event_type")
        )
    if bucket_minutes <= 0:
        raise ValueError(
            f"bucket_minutes must be positive or None, got {bucket_minutes}"
        )
    sec = bucket_minutes * 60
    base = df.withColumn(
        "__b", F.floor(F.unix_timestamp("ts") / sec).cast("long")
    ).localCheckpoint(eager=False)
    dim = base.groupBy("event_type", "__b").agg(
        F.sum("__vs").alias("__bs"), F.count(F.lit(1)).alias("__bn")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = dim.select(
        "event_type",
        "__b",
        F.coalesce(F.sum("__bs").over(wb), F.lit(0).cast("long")).alias(
            "__off_s"
        ),
        F.coalesce(F.sum("__bn").over(wb), F.lit(0).cast("long")).alias(
            "__off_k"
        ),
    )
    tot = dim.groupBy("event_type").agg(
        F.sum("__bs").alias("__tot"), F.sum("__bn").alias("__cnt")
    )
    wl = Window.partitionBy("event_type", "__b").orderBy("ts", "event_id")
    return (
        base.withColumn(
            "__sl",
            F.sum("__vs").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__kl", F.row_number().over(wl).cast("long"))
        .join(F.broadcast(offs), ["event_type", "__b"])
        .join(F.broadcast(tot), "event_type")
        .withColumn("__s", F.col("__off_s") + F.col("__sl"))
        .withColumn("__k", F.col("__off_k") + F.col("__kl"))
        .drop("__b", "__sl", "__kl", "__off_s", "__off_k")
    )


def drift_stats(
    events: DataFrame,
    scale: int = 1000,
    threshold_scaled: int = 100_000,
    bucket_minutes: int | None = 1440,
) -> DataFrame:
    """(event_type, n_points, n_drift, max_abs_drift, first_drift_ts) —
    mean-shift (drift) detection per series: the centered cumulative
    statistic ``D_k = cnt·S_k − k·total`` (= cnt·Σ_{i≤k}(v_i − mean),
    the CUSUM chart statistic with the division cleared), flagged where
    ``|D_k| > threshold_scaled·cnt``.  A series whose early values sit
    below its late values (a drifting sensor, a telemetry regime
    change) builds up a large |D| mid-series; a stationary series'
    D_k random-walks near 0.

    EXACT integer arithmetic throughout (the package's oracle-able
    discipline): values fix to integers with ``floor(value·scale)``
    (floor, not round — round-half ties differ between engines), and
    the mean-centering multiplies through by ``cnt`` instead of
    dividing, so every comparison is BIGINT and engine-portable.

    100 TB shape (r16): the DEFAULT rides the two-pass distributed
    prefix sum of :func:`_cumulative_frame` — per-(series, daily
    bucket) partials, exclusive offsets over the tiny bucket dim,
    within-bucket windows — so parallelism is series × buckets and no
    task ever sorts a full series history.  Results are identical to
    the global window for any ``bucket_minutes`` (the helper explains
    why no guard is needed); ``bucket_minutes=None`` selects the
    single-window path for comparison.  The final rollup is a
    map-side-combined groupBy on the series key."""
    d = (
        _cumulative_frame(events, scale, bucket_minutes)
        .withColumn(
            "__d", F.col("__cnt") * F.col("__s") - F.col("__k") * F.col("__tot")
        )
        .withColumn(
            "__flag",
            F.abs(F.col("__d")) > F.lit(threshold_scaled) * F.col("__cnt"),
        )
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.when(F.col("__flag"), 1).otherwise(0)).cast("bigint").alias(
            "n_drift"
        ),
        F.max(F.abs(F.col("__d"))).alias("max_abs_drift"),
        F.min(F.when(F.col("__flag"), F.col("ts"))).alias("first_drift_ts"),
    )


def changepoint(
    events: DataFrame,
    scale: int = 1000,
    bucket_minutes: int | None = 1440,
) -> DataFrame:
    """(event_type, n_points, split_k, split_ts, pre_avg_micro,
    post_avg_micro, max_abs_d) — single change-point estimation per
    series by binary segmentation over the EXACT CUSUM statistic: the
    split is argmax_k |D_k| with D_k = cnt·S_k − k·total (the standard
    least-squares mean-shift estimator with the division cleared —
    one step of the classic binary-segmentation recursion), reported
    with the segment means on each side.

    Determinism (the :func:`drift_stats` discipline): values fix to
    ``floor(value·scale)`` BIGINTs, D_k is all-integer, argmax ties
    break on the SMALLEST k, and segment means are true-floor
    micro-unit integers ((S·1000 − pmod)/k — the
    :func:`seasonal_profile` construction), so the whole estimator
    value-checks against SQL.  Interior splits only (1 ≤ k < n);
    single-point series are omitted.

    100 TB shape (r16): the DEFAULT rides the two-pass distributed
    prefix sum of :func:`_cumulative_frame` (exact for any bucket
    size — see the helper); the per-series argmax stays a window on
    the series key, but its input is the already-computed D column,
    not a sort of raw history.  ``bucket_minutes=None`` selects the
    single-window comparison path."""
    from pyspark.sql import Window

    # pre/post means are reported in MICRO units regardless of the
    # fix-point scale, so the micro multiplier derives from it
    # (r13 ADVICE fix — a hard-coded * 1000 silently misscaled any
    # non-default scale).  Exactness requires an integral multiplier.
    if scale <= 0 or 1_000_000 % scale:
        raise ValueError(
            "changepoint: scale must be a positive divisor of 1_000_000 "
            f"(micro-unit output contract), got {scale}"
        )
    micro = 1_000_000 // scale
    d = (
        _cumulative_frame(events, scale, bucket_minutes)
        .filter(F.col("__k") < F.col("__cnt"))  # interior splits only
        .withColumn(
            "__d", F.col("__cnt") * F.col("__s") - F.col("__k") * F.col("__tot")
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("__d")).desc(), F.asc("__k")
    )
    return (
        d.withColumn("__r", F.row_number().over(pick))
        .filter(F.col("__r") == 1)
        .select(
            "event_type",
            F.col("__cnt").alias("n_points"),
            F.col("__k").alias("split_k"),
            F.col("ts").alias("split_ts"),
            F.expr(
                f"CAST((__s * {micro} - pmod(__s * {micro}, __k)) "
                "div __k AS BIGINT)"
            ).alias("pre_avg_micro"),
            F.expr(
                f"CAST(((__tot - __s) * {micro} - pmod((__tot - __s) * "
                f"{micro}, __cnt - __k)) div (__cnt - __k) AS BIGINT)"
            ).alias("post_avg_micro"),
            F.abs(F.col("__d")).alias("max_abs_d"),
        )
    )


def _auto_bucket_minutes(df: DataFrame, window_rows: int) -> int | None:
    """Derive a ``rolling_stats`` bucket size from a cheap per-series
    probe (count + timespan — |series| rows collected, never data
    rows): the smallest bucket whose average occupancy is
    ≥ 4·window_rows for EVERY series (4× margin so the exactness
    guard passes under moderately non-uniform arrival).  Returns None
    (→ global window) when no series benefits: a single observation,
    zero timespan, or a derived bucket that would still hold every
    series in one bucket."""
    import logging
    import math

    rows = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi"),
    ).collect()
    if not rows:
        return None
    need, spans = [], []
    for r in rows:
        span_min = max((r["hi"] - r["lo"]) / 60.0, 1.0)
        spans.append(span_min)
        if r["n"] <= 4 * window_rows:
            continue  # the whole series is a few windows — global is fine
        rate = r["n"] / span_min  # rows per minute
        need.append(4 * window_rows / rate)
    if not need:
        logging.getLogger(__name__).info(
            "rolling_stats auto: every series holds <= 4*window_rows rows; "
            "using the global window"
        )
        return None
    bm = max(1, int(math.ceil(max(need))))
    if bm >= max(spans):
        logging.getLogger(__name__).info(
            "rolling_stats auto: derived bucket (%d min) spans every "
            "series; using the global window", bm
        )
        return None
    return bm


def rolling_stats(
    events: DataFrame,
    window_rows: int = 100,
    scale: int = 1000,
    bucket_minutes: int | None | str = "auto",
) -> DataFrame:
    """(event_type, ts, event_id, roll_n, roll_sum_milli, roll_var_num)
    — trailing ROW-window statistics per series: over the last
    ``window_rows`` events (ordered by (ts, event_id)), the exact count,
    fix-point sum, and the cleared-denominator variance numerator
    n·Σx² − (Σx)² — the feature-store primitive behind rolling
    baselines, z-scores and Bollinger-style bands, with the float
    division deferred to the consumer so the whole pipeline stays in
    exact BIGINT (the :func:`drift_stats` discipline; the numerator is
    ≥ 0 by Cauchy-Schwarz and the consumer's variance is
    num / (n·(n−1))).  ``scale`` must be a positive divisor of
    1_000_000 (ValueError otherwise); ``roll_sum_milli`` is named for
    the default milli scale and carries units of 1/``scale``.

    100 TB shape (default, ``bucket_minutes=None``): ONE shuffle keyed
    by the series column — all three window aggregates share the same
    (partition, order, frame) spec so Spark evaluates them in a single
    window pass; magnitudes stay in BIGINT (x ≤ 1e6 milli-units
    squared × a 100-row frame × n ≈ 1e16 ≪ 2^63).  The catch at scale:
    parallelism is |event types| — each type's full history sorts in
    ONE task (the r15 probe measured 6.6×-per-10× from exactly this).

    ``bucket_minutes`` (r15) is the scale path: partition by
    (event_type, time bucket) and CARRY the last ``window_rows − 1``
    rows of each bucket into its successor non-empty bucket, so every
    trailing window is fully contained in one partition — parallelism
    becomes types × buckets and each task sorts one bounded bucket.
    Results are EXACT — identical to the global window — guarded by a
    cheap bucket-dimension check: every non-first bucket's predecessor
    must hold ≥ window_rows − 1 rows (else a window could span two
    carry hops; ValueError tells the caller to enlarge the bucket).
    Carry rows keep their original (ts, event_id), so they sort ahead
    of the successor bucket's own rows, and their output rows are
    dropped (each row is EMITTED from its home bucket exactly once).
    Cost: the projected input is lazily checkpointed and read by the
    guard, the carry selection, and the main window — one materialized
    pass, two windowed reads, all bucket-bounded.

    ``bucket_minutes="auto"`` (r16, the DEFAULT — verdict: make the
    scale path reachable by default): a cheap per-series probe
    (count + timespan, |series| rows) derives the smallest bucket
    whose AVERAGE occupancy is ≥ 4·window_rows for every series (4×
    margin against non-uniform arrival).  Falls back to the global
    window — with a logged reason — when the data is too sparse for
    bucketing to help (every series would fit one bucket) or when the
    exactness guard rejects the derived bucket (a skewed series still
    has an under-filled bucket).  Either way the results are the same
    exact trailing-window statistics; auto only picks the plan."""
    from pyspark.sql import Window

    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    # same contract as changepoint (ADVICE r14): scale=0 would silently
    # zero every value; a bogus scale silently mis-scales the fix-point
    # column (named for the default milli unit — 1/scale generally)
    if scale <= 0 or 1_000_000 % scale:
        raise ValueError(
            "rolling_stats: scale must be a positive divisor of 1_000_000 "
            f"(fix-point units of 1/scale), got {scale}"
        )
    vs = F.floor(F.col("value") * scale).cast("long")
    df = events.filter(F.col("value").isNotNull()).select(
        "event_type", "ts", "event_id", vs.alias("__vs")
    )
    auto = bucket_minutes == "auto"
    if isinstance(bucket_minutes, str) and not auto:
        raise ValueError(
            f"bucket_minutes must be an int, None, or 'auto', "
            f"got {bucket_minutes!r}"
        )
    if auto:
        # r16 (optimization): the auto probe is a full pass over the
        # projected input — lazily checkpoint the projection so the
        # probe MATERIALIZES it and the guard/carry/main window reads
        # below reuse the materialized rows instead of re-scanning the
        # raw events source (guide §1.2: one pass where one suffices;
        # the probe's collect is |series| rows either way)
        df = df.localCheckpoint(eager=False)
        bucket_minutes = _auto_bucket_minutes(df, window_rows)

    def _stats(frame, w):
        roll_n = F.count(F.lit(1)).over(w).cast("long")
        roll_sum = F.sum("__vs").over(w)
        roll_sq = F.sum(F.col("__vs") * F.col("__vs")).over(w)
        return frame.select(
            "event_type",
            "ts",
            "event_id",
            roll_n.alias("roll_n"),
            roll_sum.alias("roll_sum_milli"),
            (roll_n * roll_sq - roll_sum * roll_sum).alias("roll_var_num"),
            *(["__carry"] if "__carry" in frame.columns else []),
        )

    if bucket_minutes is None:
        w = (
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(-(window_rows - 1), 0)
        )
        return _stats(df, w)
    if bucket_minutes <= 0:
        raise ValueError(
            f"bucket_minutes must be positive, got {bucket_minutes}"
        )
    bucket = F.floor(
        F.unix_timestamp("ts") / F.lit(bucket_minutes * 60)
    ).cast("long")
    base = df.withColumn("__b", bucket).localCheckpoint(eager=False)
    # bucket dimension (types × buckets rows — tiny): predecessor
    # bucket + its row count via one lag window
    wb = Window.partitionBy("event_type").orderBy("__b")
    dim = (
        base.groupBy("event_type", "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "event_type", "__b", "__n",
            F.lag("__b").over(wb).alias("__pb"),
            F.lag("__n").over(wb).alias("__pn"),
        )
        # predecessor's own predecessor (separate projection — a window
        # over a same-select lateral alias is unsupported): NULL iff
        # the predecessor is the series' FIRST bucket
        .withColumn("__ppb", F.lag("__pb").over(wb))
    )
    # exactness guard (materializes the lazy checkpoint): a window for
    # an early row of bucket b reaches back ≤ window_rows − 1 rows; one
    # carry hop supplies them IFF the predecessor holds that many —
    # UNLESS the predecessor is the series' first bucket, in which case
    # its full carry IS the entire prior history and the global window
    # clips at series start anyway (exact regardless of its size)
    bad = (
        dim.filter(
            F.col("__pb").isNotNull()
            & (F.col("__pn") < window_rows - 1)
            & F.col("__ppb").isNotNull()
        )
        .limit(1)
        .count()
    )
    if bad:
        if auto:
            # auto picked a bucket a skewed series can't fill — the
            # plan choice must never change the answer, so fall back
            # to the global window with a logged reason
            import logging

            logging.getLogger(__name__).info(
                "rolling_stats auto: derived bucket (%d min) rejected by "
                "the exactness guard (an under-filled bucket); falling "
                "back to the global window", bucket_minutes
            )
            w = (
                Window.partitionBy("event_type")
                .orderBy("ts", "event_id")
                .rowsBetween(-(window_rows - 1), 0)
            )
            return _stats(df, w)
        raise ValueError(
            "rolling_stats: some time bucket holds fewer than "
            f"window_rows - 1 = {window_rows - 1} rows, so a trailing "
            "window could span more than one bucket back — enlarge "
            f"bucket_minutes (got {bucket_minutes})"
        )
    # carry: the last window_rows − 1 rows of each bucket, retagged to
    # the SUCCESSOR non-empty bucket (dim knows each bucket's successor
    # as its own predecessor link, inverted)
    succ = dim.filter(F.col("__pb").isNotNull()).select(
        "event_type",
        F.col("__pb").alias("__b"),
        F.col("__b").alias("__sb"),
    )
    wd = Window.partitionBy("event_type", "__b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    carry = (
        base.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") <= window_rows - 1)
        .drop("__rn")
        .join(F.broadcast(succ), ["event_type", "__b"])
        .drop("__b")
        .withColumnRenamed("__sb", "__b")
        .withColumn("__carry", F.lit(True))
    )
    full = base.withColumn("__carry", F.lit(False)).unionByName(carry)
    w = (
        Window.partitionBy("event_type", "__b")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    return (
        _stats(full, w)
        .filter(~F.col("__carry"))
        .drop("__carry")
    )


def ohlc_downsample(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Open/high/low/close downsample of ``value`` per (event_type,
    time bucket) — the classic time-series compaction for dashboards
    and feature stores.  Open/close are min_by/max_by on (ts,
    event_id): deterministic under concurrent timestamps, no window
    pass needed.

    100 TB shape: one map-side-combined groupBy — the bucket key is
    derived (no pre-shuffle), partials combine before the exchange, and
    output cardinality is types × buckets (tiny)."""
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / (minutes * 60)).cast("long") * (minutes * 60)
    )
    order = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy(
        F.col("event_type"), bucket.alias("bucket")
    ).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def seasonal_profile(events: DataFrame) -> DataFrame:
    """(event_type, dow, hour, n_events, avg_value) — the
    hour-of-week seasonal baseline (the profile behind every
    'is this metric unusual for a Tuesday 3pm' alert, and the
    de-seasonalization input to drift/anomaly detection).

    Determinism: dow/hour derive from INTEGER epoch arithmetic
    (1970-01-01 was a Thursday, hence the +4 day offset) — no
    calendar/locale functions whose week-start conventions differ
    across engines.  The average is reported in floor-divided MICRO
    units (``avg_value_micro``) rather than a rounded float: the first
    draft's round(sum/1000/n, 4) landed EXACTLY on a .00005 rounding
    tie at sf0.01, where Spark's BigDecimal HALF_UP and C-library
    binary rounding disagree — floor division over exact BIGINTs has
    no tie to disagree on.  The floor division is TRUE integer floor
    (r13, ADVICE fix): subtract pmod then integer-``div`` — never a
    floor over a DOUBLE quotient, which can land half-an-ulp off an
    integer or lose bits past 2^53; and because the subtrahend makes
    the dividend exactly divisible, truncating ``div`` equals
    mathematical floor for negative sums too.  The oracle mirrors the
    same pmod-based construction (DuckDB ``%`` is sign-of-dividend;
    pmod is emulated as ``((x % n) + n) % n``).

    100 TB shape: one map-side-combined groupBy on a 7×24×|types|
    key space — the result is dashboard-sized no matter the input."""
    epoch = F.unix_timestamp("ts")
    dow = F.pmod(F.floor(epoch / F.lit(86400)) + F.lit(4), F.lit(7)).cast(
        "bigint"
    )
    hour = F.pmod(F.floor(epoch / F.lit(3600)), F.lit(24)).cast("bigint")
    vs = F.floor(F.col("value") * 1000).cast("bigint")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", dow.alias("dow"), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.sum(vs) * F.lit(1000)).alias("__s_micro"),
        )
        .select(
            "event_type",
            "dow",
            "hour",
            "n_events",
            # exact floor: pmod-adjusted dividend is exactly divisible,
            # so truncating integer div == mathematical floor, all BIGINT
            F.expr(
                "(__s_micro - pmod(__s_micro, n_events)) div n_events"
            )
            .cast("bigint")
            .alias("avg_value_micro"),
        )
    )
