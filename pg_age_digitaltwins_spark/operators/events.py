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
) -> DataFrame:
    """AS-OF join: for each left row, the most recent event at or before
    ``left_ts`` for the matching key.

    Implemented as union + window (the scalable shape: one shuffle on
    the key, no range cross-join):  tag both sides, sort by time within
    key, carry the last event forward with ``last(ignorenulls)``."""
    ev = events.select(
        F.col(event_key).alias("__k"),
        F.col("ts").alias("__t"),
        F.lit(None).cast("long").alias("__rowid"),
        F.struct(*[F.col(c) for c in events.columns]).alias("__event"),
    )
    lf = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.monotonically_increasing_id().alias("__rowid"),
        F.lit(None).cast(ev.schema["__event"].dataType).alias("__event"),
    )
    left_tagged = left.withColumn("__rowid", F.monotonically_increasing_id())
    unioned = ev.unionByName(lf)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__rowid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        unioned.withColumn("__last_event", F.last("__event", ignorenulls=True).over(w))
        .filter(F.col("__rowid").isNotNull())
        .select("__rowid", "__last_event")
    )
    return left_tagged.join(matched, "__rowid", "left").drop("__rowid")
