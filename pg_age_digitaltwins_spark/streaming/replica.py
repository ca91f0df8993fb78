"""Graph→graph CDC replication: tail a source commit log, apply each
micro-batch to a replica commit log with the join-based MERGE.

The reference's Events project replicates WAL changes to EXTERNAL
systems (Kafka/Kusto/...); the Spark-native sibling of that pattern is
a downstream graph replica maintained from the same change feed — the
lakehouse "CDF → MERGE INTO downstream table" medallion step.  The
apply operator is ``store.commit_log.merge_frames``, so the entire
batch — old images, RI checks, event re-emission — stays executor-side
regardless of batch size.

Semantics:

* Events are per-entity coalesced within the micro-batch
  (``coalesce_events`` — first-old/last-new), then split four ways
  (twin upserts / twin deletes / rel upserts / rel deletes) with all
  document fields extracted JVM-side (``get_json_object``), and applied
  as ONE atomic merge commit on the replica: the replica steps from
  consistent state to consistent state even when a batch spans many
  source commits.
* Exactly-once across foreachBatch retries: the batch id is recorded
  INSIDE the merge commit itself (the manifest ``writer`` field carries
  ``replica:batch-<id>``), so the commit and its dedup record are one
  atomic publish — a crash between the merge commit and any external
  marker cannot re-apply the batch.  A replayed batch scans recent
  replica manifests for its tag and skips.  A filesystem marker under
  ``<replica_root>/_replica_applied`` remains as the fast path (and
  records empty batches, which produce no commit to tag).
* Deletes must not orphan edges: the merge applies twin and edge
  changes together, and the source enforced referential integrity, so
  the batch's FINAL state (what ``merge_frames`` checks) always
  satisfies it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_MODEL_PATH = "$['$metadata']['$model']"


def _final_state(coalesced: DataFrame) -> DataFrame:
    """Per-txn coalesced rows → ONE row per entity for the whole batch.

    ``coalesce_events`` merges within a transaction; a micro-batch can
    span many source commits, so a second fold takes the FIRST old
    image and the LAST new image/event type across (commit_version,
    txn_id, seq) — commit_version leads because txn_id counters are
    session-local and restart per session (two sessions' txn 3 carry no
    cross-session order).  The grouping key adds the extracted
    ``$sourceId`` — relationship identity is (source, relationship_id),
    and two edges sharing a rid under different sources must not
    merge."""
    order = F.struct(
        F.coalesce(F.col("commit_version"), F.lit(0)),
        F.col("txn_id"),
        F.col("seq"),
    )
    src_key = F.coalesce(
        F.get_json_object(
            F.coalesce(F.col("new_value"), F.col("old_value")),
            "$['$sourceId']",
        ),
        F.lit(""),
    )
    return (
        coalesced.withColumn("__sk", src_key)
        .groupBy("entity_id", "graph_name", "table_name", "__sk")
        .agg(
            F.min_by("old_value", order).alias("old_value"),
            F.max_by("new_value", order).alias("new_value"),
            F.max_by("event_type", order).alias("event_type"),
            F.max("timestamp").alias("timestamp"),
            F.max(F.coalesce(F.col("commit_version"), F.lit(0))).alias(
                "commit_version"
            ),
        )
        .drop("__sk")
    )


def _split_batch(coalesced: DataFrame):
    """Batch-final EVENT_DATA rows → (twin_up, twin_del, rel_up,
    rel_del) frames in the storage row shapes ``merge_frames`` takes.
    Kind discrimination mirrors the replication classifier: a document
    with ``$relationshipId`` is an edge row, ``table_name == 'Model'``
    rows are skipped (model replication is a dimension copy, not
    CDC)."""
    doc = F.coalesce(F.col("new_value"), F.col("old_value"))
    is_rel = F.get_json_object(doc, "$['$relationshipId']").isNotNull()
    ev = coalesced.filter(F.col("table_name") != "Model")

    twins = ev.filter(~is_rel)
    twin_up = twins.filter(F.col("event_type") != "Delete").select(
        F.get_json_object("new_value", "$['$dtId']").alias("dt_id"),
        F.get_json_object("new_value", _MODEL_PATH).alias("model_id"),
        F.get_json_object("new_value", "$['$etag']").alias("etag"),
        F.col("timestamp").alias("last_update_time"),
        F.col("new_value").alias("doc"),
    )
    twin_del = twins.filter(F.col("event_type") == "Delete").select(
        F.get_json_object("old_value", "$['$dtId']").alias("dt_id")
    )

    rels = ev.filter(is_rel)
    rel_up = rels.filter(F.col("event_type") != "Delete").select(
        F.get_json_object("new_value", "$['$relationshipId']").alias(
            "relationship_id"
        ),
        F.get_json_object("new_value", "$['$sourceId']").alias("source_id"),
        F.get_json_object("new_value", "$['$targetId']").alias("target_id"),
        F.get_json_object("new_value", "$['$relationshipName']").alias("name"),
        F.get_json_object("new_value", "$['$etag']").alias("etag"),
        F.col("new_value").alias("doc"),
    )
    rel_del = rels.filter(F.col("event_type") == "Delete").select(
        F.get_json_object("old_value", "$['$sourceId']").alias("source_id"),
        F.get_json_object("old_value", "$['$relationshipId']").alias(
            "relationship_id"
        ),
    )
    return twin_up, twin_del, rel_up, rel_del


def apply_changes_to_replica(
    spark: SparkSession,
    events: DataFrame,
    replica_root: str,
    batch_id: int | str | None = None,
    writer: str = "replica",
) -> int | None:
    """Apply one batch of EVENT_DATA rows to the replica commit log.

    Returns the committed replica version, or None when the batch was
    empty / already applied (idempotent replay)."""
    from pg_age_digitaltwins_spark.store.commit_log import merge_frames
    from pg_age_digitaltwins_spark.streaming.changes import coalesce_events

    applied_dir = os.path.join(replica_root, "_replica_applied")
    marker = (
        os.path.join(applied_dir, f"batch-{batch_id}")
        if batch_id is not None
        else None
    )
    if marker is not None and os.path.exists(marker):
        return None  # foreachBatch retry: already applied (fast path)
    writer_tag = (
        f"{writer}:batch-{batch_id}" if batch_id is not None else writer
    )
    if batch_id is not None and _batch_already_committed(
        replica_root, writer_tag
    ):
        # crash/retry landed between the merge commit and the marker
        # write: the commit itself carries the batch id, so the batch is
        # detectably applied even without the marker.  Re-write the
        # marker and skip.
        os.makedirs(applied_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("-1")
        os.replace(tmp, marker)
        return None
    boot = _bootstrap_version(replica_root)
    if boot:
        # the clone already contains every commit ≤ boot; replaying
        # them could violate RI relative to the bootstrapped state
        # (e.g. an old edge whose endpoint was deleted pre-bootstrap).
        # Filter on the stage-time commit_version stamp — NOT txn_id,
        # which is a session-local counter that restarts at 1 and would
        # silently drop post-bootstrap CRUD/import commits.
        events = events.filter(
            F.coalesce(F.col("commit_version"), F.lit(0)) > boot
        )
    coalesced = _final_state(coalesce_events(events)).localCheckpoint(eager=True)
    # ONE aggregation job answers everything driver-side: which of the
    # four merge branches are non-empty (empty frames must not reach
    # merge_frames as branches that still scan) and the progress
    # watermark — the max SOURCE commit version consumed, which a
    # vacuum policy gates on (never drop change batches a lagging
    # consumer has not read; the Delta VACUUM-vs-slowest-consumer
    # retention contract).  r7 ran four take(1) probes + an agg here.
    doc = F.coalesce(F.col("new_value"), F.col("old_value"))
    is_rel = F.get_json_object(doc, "$['$relationshipId']").isNotNull()
    ev_rows = F.col("table_name") != "Model"
    is_del = F.col("event_type") == "Delete"
    flags = coalesced.agg(
        F.max((ev_rows & ~is_rel & ~is_del).cast("int")).alias("t_up"),
        F.max((ev_rows & ~is_rel & is_del).cast("int")).alias("t_del"),
        F.max((ev_rows & is_rel & ~is_del).cast("int")).alias("r_up"),
        F.max((ev_rows & is_rel & is_del).cast("int")).alias("r_del"),
        F.max(F.coalesce(F.col("commit_version"), F.lit(0))).alias("v"),
    ).collect()[0]
    src_seen = flags["v"]
    t_up, t_del, r_up, r_del = _split_batch(coalesced)
    t_up_n = bool(flags["t_up"])
    t_del_n = bool(flags["t_del"])
    r_up_n = bool(flags["r_up"])
    r_del_n = bool(flags["r_del"])
    version = None
    if t_up_n or t_del_n or r_up_n or r_del_n:
        version = merge_frames(
            spark,
            replica_root,
            twin_upserts=t_up if t_up_n else None,
            twin_deletes=t_del if t_del_n else None,
            rel_upserts=r_up if r_up_n else None,
            rel_deletes=r_del if r_del_n else None,
            writer=writer_tag,
        )
    if marker is not None:
        os.makedirs(applied_dir, exist_ok=True)
        # atomic (temp + rename): a crash mid-write must not leave an
        # empty marker that silently skips the batch on retry
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version if version is not None else -1))
        os.replace(tmp, marker)
    if src_seen:
        _advance_source_watermark(replica_root, int(src_seen))
    return version


def _advance_source_watermark(replica_root: str, version: int) -> None:
    """Monotonically record the max source commit version consumed."""
    applied_dir = os.path.join(replica_root, "_replica_applied")
    os.makedirs(applied_dir, exist_ok=True)
    path = os.path.join(applied_dir, "_source_version")
    if replica_source_version(replica_root) >= version:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, path)


def replica_source_version(replica_root: str) -> int:
    """The max source commit version this replica has consumed — the
    bootstrap clone version until the first change batch applies, then
    the per-batch watermark.  0 for a never-bootstrapped replica."""
    try:
        with open(
            os.path.join(replica_root, "_replica_applied", "_source_version")
        ) as f:
            applied = int(f.read().strip())
    except (OSError, ValueError):
        applied = 0
    return max(applied, _bootstrap_version(replica_root))


def replica_lag(source_root: str, replica_root: str) -> int:
    """How many source commit versions the replica has NOT consumed yet.

    The vacuum guard: ``vacuum(source_root, keep_last=k)`` is safe for
    this replica only when ``replica_lag(...) < k`` — change batches
    older than the retained window are deleted, and a file-stream
    consumer cannot detect (let alone replay) files that vanished
    before it listed them.  This is the Delta retention contract
    (VACUUM must keep what the slowest CDF consumer still needs),
    surfaced as a number an operator can gate on.

    Event-less commits (compaction, snapshot-only) publish no change
    batch — nothing to consume, so they never count as lag."""
    from pg_age_digitaltwins_spark.store.commit_log import CommitLog

    wm = replica_source_version(replica_root)
    log = CommitLog(source_root)
    lag = 0
    for v in log.versions():
        if v <= wm:
            continue
        try:
            if log.manifest(v).get("change_dir"):
                lag += 1
        except OSError:
            continue
    return lag


def _batch_already_committed(
    replica_root: str, writer_tag: str, lookback: int = 32
) -> bool:
    """True when a recent replica commit's manifest ``writer`` equals
    ``writer_tag``.  Batches apply in order, so a retried batch's commit
    — if it exists at all — is at or very near the log head; a bounded
    lookback keeps the check O(1) regardless of log length."""
    from pg_age_digitaltwins_spark.store.commit_log import CommitLog

    log = CommitLog(replica_root)
    latest = log.latest_version()
    for v in range(latest, max(latest - lookback, 0), -1):
        try:
            if log.manifest(v).get("writer") == writer_tag:
                return True
        except OSError:
            continue
    return False


def _bootstrap_version(replica_root: str) -> int:
    try:
        with open(
            os.path.join(replica_root, "_replica_applied", "_bootstrap")
        ) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 0


def bootstrap_replica(
    spark: SparkSession, source_root: str, replica_root: str
) -> int:
    """Clone the source's CURRENT snapshot into an empty replica and
    record the cloned version — the Delta-CDF consumer pattern (CLONE at
    version V, then ``table_changes(starting_version = V+1)``).  Change
    batches at or below the bootstrap version are skipped by the apply
    step: replaying them against the clone could violate referential
    integrity (an old edge insert whose endpoint was deleted again
    before the clone).  Idempotent: an already-bootstrapped (or
    non-empty) replica is left alone."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog,
        commit_snapshot,
        load_latest,
    )

    if CommitLog(replica_root).latest_version() > 0:
        return _bootstrap_version(replica_root)
    src_version = CommitLog(source_root).latest_version()
    if src_version == 0:
        return 0
    store, _ = load_latest(spark, source_root)
    commit_snapshot(store, replica_root, writer="replica-bootstrap")
    applied_dir = os.path.join(replica_root, "_replica_applied")
    os.makedirs(applied_dir, exist_ok=True)
    boot_marker = os.path.join(applied_dir, "_bootstrap")
    tmp = boot_marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(src_version))
    os.replace(tmp, boot_marker)
    return src_version


def replicate_catch_up(
    spark: SparkSession, source_root: str, replica_root: str
) -> int | None:
    """Batch catch-up: apply every unconsumed source change batch as
    ONE atomic replica commit, without Structured Streaming machinery.

    Same apply operator, same exactly-once story (the batch identity is
    the consumed source-version RANGE, recorded in the merge commit's
    writer tag and the marker file), but none of the ~3 s stream
    startup — the right path for backfill and for cron-style periodic
    replication; ``run_replication`` remains the continuous-tail path.
    Returns the replica version committed, or None when already caught
    up / replayed."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog,
        read_changes_since,
    )

    bootstrap_replica(spark, source_root, replica_root)
    seen = max(
        replica_source_version(replica_root), _bootstrap_version(replica_root)
    )
    latest = CommitLog(source_root).latest_version()
    if latest <= seen:
        return None
    events = read_changes_since(spark, source_root, after_version=seen)
    return apply_changes_to_replica(
        spark, events, replica_root, batch_id=f"catchup-{seen}-{latest}"
    )


def run_replication(
    spark: SparkSession,
    source_root: str,
    replica_root: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous replication query: bootstrap (snapshot clone at the
    source's current version, once) + readStream over the source commit
    log's change feed → ``apply_changes_to_replica`` per micro-batch,
    skipping change batches the clone already contains.  Returns the
    started StreamingQuery (caller owns the lifecycle); default trigger
    availableNow (catch-up-and-stop)."""
    from pg_age_digitaltwins_spark.store.commit_log import changes_glob
    from pg_age_digitaltwins_spark.streaming.changes import EVENT_DATA_SCHEMA

    bootstrap_replica(spark, source_root, replica_root)

    reader = spark.readStream.schema(EVENT_DATA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(
        changes_glob(source_root),
        timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSS",
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes_to_replica(spark, batch_df, replica_root, batch_id)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
