"""Incremental view maintenance over the change feed.

The reference has no materialized views — every aggregate re-scans the
graph.  At 100 TB a dashboard query like "twins per model" cannot
afford that, so this module maintains the aggregate INCREMENTALLY from
the same CDC feed the event pipeline tails: each micro-batch folds its
+1/−1 deltas into a tiny versioned state table, and reads cost O(state)
instead of O(graph).

Exactly-once without a transactional store: state versions are keyed
by the Structured Streaming ``batch_id``.  A replayed batch (foreachBatch
is at-least-once on retry) sees its version directory already present
and skips — the classic idempotent-by-batch-id pattern — and the
``_latest`` pointer is an atomic rename, so readers never observe a
torn state.

Scale shape per batch: one map-side-combined groupBy over the batch's
events (delta rows ≤ distinct models touched), one broadcast-sized
full-outer merge with the previous state (state rows = distinct models,
dimension-sized by construction).  The graph itself is never scanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MODEL_PATH = "$['$metadata']['$model']"


def twin_count_deltas(events: DataFrame) -> DataFrame:
    """Per-model twin-count deltas for one batch of EVENT_DATA rows.

    Insert → +1 on the new doc's model; Delete → −1 on the old doc's
    model; Update → a (−1 old, +1 new) pair so model MIGRATIONS move
    the count between models (same-model updates cancel to zero and
    are dropped).  Relationship/Model events are filtered out by key
    presence, mirroring the replication classifier
    (``AgeDigitalTwinsReplication.cs:586-616``).
    """
    doc = F.coalesce(F.col("new_value"), F.col("old_value"))
    twins = events.filter(
        F.get_json_object(doc, "$['$relationshipId']").isNull()
        & (F.col("table_name") != "Model")
    )
    old_model = F.get_json_object("old_value", MODEL_PATH)
    new_model = F.get_json_object("new_value", MODEL_PATH)
    signed = twins.select(
        F.explode(
            F.array(
                F.struct(old_model.alias("model_id"), F.lit(-1).alias("d")),
                F.struct(new_model.alias("model_id"), F.lit(1).alias("d")),
            )
        ).alias("x")
    ).select("x.model_id", "x.d")
    return (
        signed.filter(F.col("model_id").isNotNull())
        .groupBy("model_id")
        .agg(F.sum("d").cast("long").alias("delta"))
        .filter(F.col("delta") != 0)
    )


class ModelCountsView:
    """Maintained ``(model_id, n_twins)`` table under ``state_dir``.

    The machinery is generic over the delta function: subclasses /
    instances swap ``delta_fn`` (batch events → (key, delta)) and the
    key/count column names — ``RelationshipCountsView`` below reuses
    everything but the fold."""

    key_col = "model_id"
    count_col = "n_twins"

    def __init__(self, state_dir: str, delta_fn=None):
        self.state_dir = state_dir
        self.delta_fn = delta_fn or twin_count_deltas
        os.makedirs(state_dir, exist_ok=True)

    # -- state versioning ----------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.state_dir, "_latest")

    def _current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.state_dir, f"v{v}")

    def read(self, spark: SparkSession) -> DataFrame:
        v = self._current_version()
        if v is None:
            return spark.createDataFrame(
                [], f"{self.key_col} string, {self.count_col} long"
            )
        return spark.read.parquet(self._version_dir(v))

    # -- the foreachBatch body -----------------------------------------
    def apply_batch(self, events: DataFrame, batch_id: int) -> None:
        spark = events.sparkSession
        batch_id = int(batch_id)
        cur = self._current_version()
        out = self._version_dir(batch_id)
        if cur is not None and batch_id < cur:
            # batch ids restarted below the pointed state: the streaming
            # checkpoint was reset against an existing state dir.
            # Proceeding would silently rewind the view (a stale
            # v<batch_id>/_SUCCESS from the previous generation makes
            # the replay-skip path re-point backwards) — fail loudly so
            # the operator resets BOTH dirs together.
            raise ValueError(
                f"batch id {batch_id} is behind the current state "
                f"version {cur}: streaming checkpoint and state_dir are "
                "from different generations — reset them together"
            )
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            # replayed batch after a crash-before-checkpoint: the state
            # transition already happened — skip, don't double-count
            self._point_to(batch_id)
            return
        # delta_fn contract: (key_col, delta) rows for this batch
        deltas = self.delta_fn(events)
        merged = (
            self.read(spark)
            .join(deltas, self.key_col, "full_outer")
            .select(
                self.key_col,
                (
                    F.coalesce(F.col(self.count_col), F.lit(0))
                    + F.coalesce(F.col("delta"), F.lit(0))
                ).alias(self.count_col),
            )
            .filter(F.col(self.count_col) != 0)
        )
        merged.write.mode("overwrite").parquet(out)
        self._point_to(batch_id)
        self._vacuum(batch_id)

    def _vacuum(self, current: int, keep: int = 2) -> None:
        """Drop state versions older than ``current − keep`` — each
        batch writes a full state copy, so an unbounded retention grows
        linearly with trigger count (~17k copies/day at 5 s triggers).
        ``keep`` predecessors stay for crash-recovery reads in flight."""
        import shutil

        for name in os.listdir(self.state_dir):
            if not name.startswith("v"):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v < current - keep:
                shutil.rmtree(os.path.join(self.state_dir, name), ignore_errors=True)

    def _point_to(self, v: int) -> None:
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer())


def rel_count_deltas(events: DataFrame) -> DataFrame:
    """Per-label relationship-count deltas for one batch: −1 for each
    old image, +1 for each new image (updates cancel — an edge's label
    is its table and cannot change), keyed on the EventData table name
    (= the relationship name, per the replication classifier)."""
    doc = F.coalesce(F.col("new_value"), F.col("old_value"))
    rels = events.filter(
        F.get_json_object(doc, "$['$relationshipId']").isNotNull()
    )
    signed = rels.select(
        F.explode(
            F.array(
                F.struct(
                    F.when(F.col("old_value").isNotNull(), F.col("table_name"))
                    .alias("name"),
                    F.lit(-1).alias("d"),
                ),
                F.struct(
                    F.when(F.col("new_value").isNotNull(), F.col("table_name"))
                    .alias("name"),
                    F.lit(1).alias("d"),
                ),
            )
        ).alias("x")
    ).select("x.name", "x.d")
    return (
        signed.filter(F.col("name").isNotNull())
        .groupBy("name")
        .agg(F.sum("d").cast("long").alias("delta"))
        .filter(F.col("delta") != 0)
    )


class RelationshipCountsView(ModelCountsView):
    """Maintained ``(name, n_rels)`` table — same versioned state and
    idempotency machinery, different fold."""

    key_col = "name"
    count_col = "n_rels"

    def __init__(self, state_dir: str):
        super().__init__(state_dir, delta_fn=rel_count_deltas)


def maintain_model_counts(
    spark: SparkSession,
    feed_path: str,
    state_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    view: ModelCountsView | None = None,
):
    """Start the maintenance query: readStream over the EventData feed
    (flat ND-JSON dir or a commit-log root, same detection as
    ``run_change_stream``) → per-batch delta fold into the state table.
    Pass ``view`` to maintain any ``ModelCountsView``-family view
    (e.g. ``RelationshipCountsView(state_dir)``) with the same wiring.
    Returns the started StreamingQuery."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        changes_glob,
        is_commit_log_root,
    )
    from pg_age_digitaltwins_spark.streaming.changes import EVENT_DATA_SCHEMA

    if is_commit_log_root(feed_path):
        feed_path = changes_glob(feed_path)
    view = view or ModelCountsView(state_dir)
    stream = spark.readStream.schema(EVENT_DATA_SCHEMA).json(
        feed_path, timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSS"
    )
    return (
        stream.writeStream.foreachBatch(view.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
