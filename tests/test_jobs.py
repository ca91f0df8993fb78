"""Import/delete job semantics (SURVEY.md §2.3 D12-D14) — sectioned
ND-JSON, header validation, checkpoint/resume, per-line errors, and the
distributed one-pass import."""

from __future__ import annotations

import json

import pytest

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
from pg_age_digitaltwins_spark.jobs import (
    ImportCheckpoint,
    ImportError_,
    ImportJob,
    JobRecord,
    JobService,
    delete_job,
    import_file_distributed,
)
from pg_age_digitaltwins_spark.store.graph_store import GraphStore

MODEL = {
    "@id": "dtmi:j:Thing;1", "@type": "Interface",
    "@context": "dtmi:dtdl:context;3",
    "contents": [{"@type": "Property", "name": "x", "schema": "double"}],
}


def ndjson(*objs):
    return [json.dumps(o) for o in objs]


def full_file(n_twins=5):
    lines = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0", "author": "test", "organization": "test"},
        {"Section": "Models"},
        MODEL,
        {"Section": "Twins"},
        *[
            {"$dtId": f"t{i}", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": float(i)}
            for i in range(n_twins)
        ],
        {"Section": "Relationships"},
        *[
            {"$relationshipId": f"r{i}", "$sourceId": f"t{i}",
             "$targetId": f"t{(i + 1) % n_twins}", "$relationshipName": "next"}
            for i in range(n_twins)
        ],
    )
    return lines


@pytest.fixture()
def client(spark):
    return DigitalTwinsSparkClient(GraphStore.empty(spark))


def test_import_full_file(client):
    rec = ImportJob(client).run(full_file(), "job-1")
    assert (rec.models_created, rec.twins_created, rec.relationships_created) == (1, 5, 5)
    assert rec.status == "Succeeded"
    assert client.get_digital_twin("t3")["x"] == 3.0
    assert client.get_relationship("t3", "r3")["$targetId"] == "t4"


def test_import_header_required(client):
    with pytest.raises(ImportError_, match="First section must be 'Header'"):
        ImportJob(client).run(ndjson({"Section": "Models"}, MODEL), "job-2")


def test_import_bad_version(client):
    with pytest.raises(ImportError_, match="Unsupported file version"):
        ImportJob(client).run(
            ndjson({"Section": "Header"}, {"fileVersion": "9.9"}), "job-3"
        )


def test_import_per_line_errors(client):
    lines = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0"},
        {"Section": "Models"},
        MODEL,
        {"Section": "Twins"},
        {"$dtId": "ok", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": 1.0},
        {"$dtId": "bad", "$metadata": {"$model": "dtmi:j:Thing;1"}, "nope": 1},
    ) + ["{not json"]
    rec = ImportJob(client).run(lines, "job-4")
    assert rec.twins_created == 1
    assert rec.error_count == 2
    assert rec.status == "PartiallySucceeded"


def test_import_resume_from_checkpoint(client):
    """Resume skips lines before the checkpoint (ImportJob.cs resume)."""
    lines = full_file()
    job = ImportJob(client)
    rec1 = job.run(lines, "job-5")
    # simulate a crash after the Twins section finished at line 10
    cp = ImportCheckpoint(
        "job-5b", section="Relationships", line_number=len(lines) - 5,
        twins_processed=5, models_processed=1,
    )
    client2 = DigitalTwinsSparkClient(client.store)
    rec2 = ImportJob(client2).run(lines, "job-5b", resume_from=cp)
    # only the remaining relationship lines re-run
    assert rec2.relationships_created == 5
    assert rec2.twins_created == 5  # carried from checkpoint
    assert rec1.status == rec2.status == "Succeeded"


def test_import_distributed(client, spark, tmp_path):
    p = tmp_path / "import.ndjson"
    p.write_text("\n".join(full_file(8)) + "\n")
    rec = import_file_distributed(client, spark, str(p))
    assert (rec.models_created, rec.twins_created, rec.relationships_created) == (1, 8, 8)
    assert client.store.twins.count() == 8
    assert client.store.relationships.count() == 8


def test_delete_job(client):
    ImportJob(client).run(full_file(3), "job-6")
    counts = delete_job(client)
    assert counts == {"relationships": 3, "twins": 3, "models": 1}
    assert client.store.twins.count() == 0
    assert client.store.models.count() == 0


def test_checkpointed_delete_job_full_run(client):
    """Phased delete (relationships → twins → models), counters on the
    record, checkpoint marked Completed (``DeleteJob.cs:195-245``)."""
    from pg_age_digitaltwins_spark.jobs import DeleteJob

    ImportJob(client).run(full_file(4), "imp")
    svc = JobService()
    rec = DeleteJob(client, svc).run("del-1")
    assert rec.status == "Succeeded" and rec.job_type == "deletion"
    assert (rec.relationships_deleted, rec.twins_deleted, rec.models_deleted) == (4, 4, 1)
    assert client.store.twins.count() == 0
    assert client.store.relationships.count() == 0
    assert client.store.models.count() == 0
    assert svc.load_delete_checkpoint("del-1").section == "Completed"


def test_checkpointed_delete_job_resumes_at_phase(client):
    """A crash inside the twins phase leaves relationships completed in
    the checkpoint; the resumed run skips phase 1 (its counter is
    preserved, not recounted against the now-empty table) and finishes
    twins + models."""
    from pg_age_digitaltwins_spark.jobs import DeleteJob

    ImportJob(client).run(full_file(5), "imp")
    svc = JobService()

    class _Crashing(DeleteJob):
        def _phase_hook(self, section):
            if section == "Twins":
                raise RuntimeError("killed mid-job")

    rec = _Crashing(client, svc).run("del-2")
    assert rec.status == "Failed"
    cp = svc.load_delete_checkpoint("del-2")
    assert cp.relationships_completed and not cp.twins_completed
    assert cp.relationships_deleted == 5
    assert client.store.relationships.count() == 0  # phase 1 applied
    assert client.store.twins.count() == 5  # phase 2 not yet

    rec2 = DeleteJob(client, svc).run("del-2")
    assert rec2.status == "Succeeded"
    # phase-1 counter preserved across the resume, not recounted as 0
    assert rec2.relationships_deleted == 5
    assert (rec2.twins_deleted, rec2.models_deleted) == (5, 1)
    assert client.store.twins.count() == 0 and client.store.models.count() == 0


def test_delete_checkpoint_survives_service_restart(client, tmp_path):
    """With a durable lease store, a NEW JobService instance loads the
    dead service's delete checkpoint from disk
    (``DeleteJobCheckpointTests.cs::DeleteJobCheckpoint_ShouldSurvive_
    JobServiceRestart``)."""
    from pg_age_digitaltwins_spark.jobs import DeleteJob, FileLeaseStore

    ImportJob(client).run(full_file(3), "imp")
    store_path = str(tmp_path / "leases")
    svc1 = JobService(lease_store=FileLeaseStore(store_path))

    class _Crashing(DeleteJob):
        def _phase_hook(self, section):
            if section == "Models":
                raise RuntimeError("killed before models")

    rec = _Crashing(client, svc1).run("del-3")
    assert rec.status == "Failed"

    # fresh service on the same path (restart): checkpoint comes back
    svc2 = JobService(lease_store=FileLeaseStore(store_path))
    cp = svc2.load_delete_checkpoint("del-3")
    assert cp is not None and cp.twins_completed and not cp.models_completed
    rec2 = DeleteJob(client, svc2).run("del-3")
    assert rec2.status == "Succeeded"
    assert (rec2.relationships_deleted, rec2.twins_deleted, rec2.models_deleted) == (3, 3, 1)


def test_delete_job_lock_contention(client):
    """A second worker cannot run the job while the first holds the
    lease (same contract as import locks)."""
    from pg_age_digitaltwins_spark.jobs import DeleteJob

    ImportJob(client).run(full_file(2), "imp")
    svc = JobService()
    assert svc.acquire_lock("del-4", "other-worker")
    with pytest.raises(RuntimeError, match="locked by another worker"):
        DeleteJob(client, svc).run("del-4", owner="worker-1")
    svc.release_lock("del-4", "other-worker")
    assert DeleteJob(client, svc).run("del-4").status == "Succeeded"


def _strip_stamps(doc):
    d = {k: v for k, v in doc.items() if k not in ("$etag", "$metadata")}
    meta = {k: v for k, v in (doc.get("$metadata") or {}).items() if k == "$model"}
    d["$metadata"] = meta
    return d


def test_import_distributed_matches_line_path(client, spark, tmp_path):
    """The distributed one-pass import produces the same graph as the
    checkpointed line-at-a-time path (modulo timestamps/etags)."""
    lines = full_file(12)
    ImportJob(client).run(lines, "job-eq-a")
    p = tmp_path / "eq.ndjson"
    p.write_text("\n".join(lines) + "\n")
    client2 = DigitalTwinsSparkClient(GraphStore.empty(spark))
    rec = import_file_distributed(client2, spark, str(p))
    assert rec.status == "Succeeded"

    def twins_of(c):
        return sorted(
            json.dumps(_strip_stamps(json.loads(r["doc"])), sort_keys=True)
            for r in c.store.twins.select("doc").collect()
        )

    def rels_of(c):
        return sorted(
            json.dumps(_strip_stamps(json.loads(r["doc"])), sort_keys=True)
            for r in c.store.relationships.select("doc").collect()
        )

    assert twins_of(client) == twins_of(client2)
    assert rels_of(client) == rels_of(client2)


def test_import_distributed_per_line_errors(client, spark, tmp_path):
    lines = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0"},
        {"Section": "Models"},
        MODEL,
        {"Section": "Twins"},
        {"$dtId": "ok", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": 1.0},
        {"$dtId": "bad", "$metadata": {"$model": "dtmi:j:Thing;1"}, "nope": 1},
    ) + ["{not json"] + ndjson(
        {"Section": "Relationships"},
        {"$relationshipId": "r-ok", "$sourceId": "ok", "$targetId": "ok",
         "$relationshipName": "self"},
        {"$relationshipId": "r-ghost", "$sourceId": "ok", "$targetId": "ghost",
         "$relationshipName": "to"},
        {"$relationshipId": "r-invalid", "$sourceId": "ok"},
    )
    p = tmp_path / "err.ndjson"
    p.write_text("\n".join(lines) + "\n")
    rec = import_file_distributed(client, spark, str(p))
    assert rec.twins_created == 1
    assert rec.relationships_created == 1
    # bad twin + non-JSON line + invalid rel doc + missing endpoint
    assert rec.error_count == 4
    assert rec.status == "PartiallySucceeded"
    assert client.store.twins.count() == 1
    assert client.store.relationships.count() == 1


def test_import_distributed_replaces_existing(client, spark, tmp_path):
    """MERGE semantics: re-importing replaces rows by key (last line
    wins within the file too), and the import scales as DataFrame ops —
    a row count well past any driver batch size."""
    n = 2000
    lines = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0"},
        {"Section": "Models"},
        MODEL,
        {"Section": "Twins"},
        *[
            {"$dtId": f"t{i}", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": float(i)}
            for i in range(n)
        ],
        # duplicate key inside the file: the later line must win
        {"$dtId": "t0", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": -1.0},
    )
    p = tmp_path / "big.ndjson"
    p.write_text("\n".join(lines) + "\n")
    rec = import_file_distributed(client, spark, str(p))
    assert rec.twins_created == n + 1
    assert client.store.twins.count() == n
    assert client.get_digital_twin("t0")["x"] == -1.0
    # re-import with changed values replaces, not duplicates
    lines2 = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0"},
        {"Section": "Twins"},
        {"$dtId": "t1", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": 99.0},
    )
    p2 = tmp_path / "again.ndjson"
    p2.write_text("\n".join(lines2) + "\n")
    import_file_distributed(client, spark, str(p2))
    assert client.store.twins.count() == n
    assert client.get_digital_twin("t1")["x"] == 99.0


def test_import_distributed_error_log_output(client, spark, tmp_path):
    """Per-line errors stream to the output path as JSON part-files
    (the reference's output-blob log), written by executors."""
    lines = ndjson(
        {"Section": "Header"},
        {"fileVersion": "1.0.0"},
        {"Section": "Models"},
        MODEL,
        {"Section": "Twins"},
        {"$dtId": "ok", "$metadata": {"$model": "dtmi:j:Thing;1"}, "x": 1.0},
        {"$dtId": "bad", "$metadata": {"$model": "dtmi:j:Thing;1"}, "nope": 1},
    ) + ["{not json"]
    p = tmp_path / "in.ndjson"
    p.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "errlog")
    rec = import_file_distributed(client, spark, str(p), output_path=out)
    assert rec.error_count == 2
    logged = spark.read.json(out).collect()
    assert sorted((r["section"], r["error"] is not None) for r in logged) == [
        ("Twins", True), ("Twins", True),
    ]


def test_job_lock_leases():
    """D14 lock semantics: TTL lease, heartbeat renewal, stale takeover
    (mirrors the reference's Postgres lock service contract)."""
    clock = [0.0]
    svc = JobService(lock_ttl_s=10.0, clock=lambda: clock[0])
    assert svc.acquire_lock("j1", "runner-a")
    assert not svc.acquire_lock("j1", "runner-b")     # held, fresh lease
    assert svc.acquire_lock("j1", "runner-a")         # re-entrant renew
    clock[0] = 5.0
    assert svc.heartbeat("j1", "runner-a")            # renews to t=15
    clock[0] = 12.0
    assert not svc.acquire_lock("j1", "runner-b")     # heartbeat kept it alive
    clock[0] = 16.0
    assert svc.acquire_lock("j1", "runner-b")         # lease expired: takeover
    assert not svc.heartbeat("j1", "runner-a")        # old owner lost the lease
    svc.release_lock("j1", "runner-a")                # no-op: not the owner
    assert not svc.acquire_lock("j1", "runner-a")
    svc.release_lock("j1", "runner-b")
    assert svc.acquire_lock("j1", "runner-a")


def test_import_distributed_executor_side_change_capture(client, spark, tmp_path):
    """Feed-attached change capture: a bulk import writes per-row
    Insert events to the feed as executor part-files, the driver-side
    events list stays EMPTY, and run_change_stream delivers them.  A
    re-import of one twin is captured as Update with the old image."""
    from pg_age_digitaltwins_spark.streaming.sinks import (
        EventRoute,
        EventRouter,
        InMemoryEventSink,
        run_change_stream,
    )

    feed = tmp_path / "feed"
    client.changes.attach_feed(str(feed))

    n = 200
    p = tmp_path / "import.ndjson"
    p.write_text("\n".join(full_file(n)) + "\n")
    rec = import_file_distributed(client, spark, str(p))
    assert rec.status == "Succeeded"
    assert client.changes.events == []  # nothing accumulated driver-side

    rows = spark.read.schema(
        __import__(
            "pg_age_digitaltwins_spark.streaming.changes", fromlist=["EVENT_DATA_SCHEMA"]
        ).EVENT_DATA_SCHEMA
    ).json(str(feed))
    # n twin + n relationship events + 1 model create
    assert rows.count() == 2 * n + 1
    assert rows.filter("event_type = 'Insert'").count() == 2 * n + 1
    assert rows.filter("table_name = 'Model'").count() == 1
    assert rows.filter("table_name = 'Twin'").count() == n
    assert rows.filter("table_name = 'next'").count() == n

    # point mutation on the attached log also writes through
    client.update_digital_twin(
        "t0", [{"op": "replace", "path": "/x", "value": 99.0}]
    )
    assert client.changes.events == []

    router = EventRouter(source="src-import")
    mem = InMemoryEventSink("mem")
    router.add_sink(mem)
    router.add_route(EventRoute("mem", "EventNotification"))
    q = run_change_stream(spark, str(feed), router, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    # model events format to nothing (reference emits no model CloudEvents)
    types = [e["type"] for e in mem.events]
    assert len(types) == 2 * n + 1
    assert types.count("Konnektr.Graph.Twin.Create") == n
    assert types.count("Konnektr.Graph.Relationship.Create") == n
    assert types.count("Konnektr.Graph.Twin.Update") == 1
    upd = next(e for e in mem.events if e["type"] == "Konnektr.Graph.Twin.Update")
    assert any(
        pch["path"] == "/x" and pch["value"] == 99.0 for pch in upd["data"]["patch"]
    )


def test_file_lease_store_two_services_contend(tmp_path):
    """Two JobService instances on ONE lease directory: exactly one
    owner at a time, heartbeats keep the lease, stale leases are taken
    over after TTL, release hands off immediately."""
    from pg_age_digitaltwins_spark.jobs import FileLeaseStore, JobService

    clock = [100.0]
    a = JobService(lock_ttl_s=10.0, clock=lambda: clock[0],
                   lease_store=FileLeaseStore(str(tmp_path)))
    b = JobService(lock_ttl_s=10.0, clock=lambda: clock[0],
                   lease_store=FileLeaseStore(str(tmp_path)))

    assert a.acquire_lock("job-1", "driver-a")
    assert not b.acquire_lock("job-1", "driver-b")  # exactly one owner
    assert a.acquire_lock("job-1", "driver-a")      # re-entrant renewal

    clock[0] += 8.0
    assert a.heartbeat("job-1", "driver-a")         # renewed at t=108
    clock[0] += 8.0                                 # t=116 < 108+10
    assert not b.acquire_lock("job-1", "driver-b")

    clock[0] += 3.0                                 # t=119 > lease expiry
    assert b.acquire_lock("job-1", "driver-b")      # stale takeover
    assert not a.heartbeat("job-1", "driver-a")     # a lost the lease
    assert not a.acquire_lock("job-1", "driver-a")

    b.release_lock("job-1", "driver-b")
    assert a.acquire_lock("job-1", "driver-a")      # immediate handoff

    # independent jobs don't contend
    assert b.acquire_lock("job-2", "driver-b")


def test_file_lease_store_survives_restart(tmp_path):
    """Leases are durable: a NEW service instance (fresh process stand-
    in) sees the holder written by a previous one."""
    from pg_age_digitaltwins_spark.jobs import FileLeaseStore, JobService

    clock = [50.0]
    first = JobService(lock_ttl_s=10.0, clock=lambda: clock[0],
                       lease_store=FileLeaseStore(str(tmp_path)))
    assert first.acquire_lock("job-9", "driver-a")
    del first

    again = JobService(lock_ttl_s=10.0, clock=lambda: clock[0],
                       lease_store=FileLeaseStore(str(tmp_path)))
    assert not again.acquire_lock("job-9", "driver-b")
    clock[0] += 11.0
    assert again.acquire_lock("job-9", "driver-b")


def test_import_distributed_commit_root_cow(client, spark, tmp_path):
    """Bulk import through the table format: the merged store COW-commits
    only the touched partitions, the per-row change batch lands in the
    SAME commit, and a stream tailing the root consumes it."""
    from pg_age_digitaltwins_spark.store.commit_log import (
        CommitLog,
        commit_snapshot,
        load_latest,
        read_changes_since,
    )
    from pg_age_digitaltwins_spark.streaming.sinks import (
        EventRoute,
        EventRouter,
        InMemoryEventSink,
        run_change_stream,
    )

    root = str(tmp_path / "table")
    v0 = commit_snapshot(client.store, root)  # empty base version
    assert v0 == 1

    n = 100
    p = tmp_path / "import.ndjson"
    p.write_text("\n".join(full_file(n)) + "\n")
    rec = import_file_distributed(client, spark, str(p), commit_root=root)
    assert rec.status == "Succeeded"
    assert rec.committed_version == 2

    log = CommitLog(root)
    m2 = log.manifest(2)
    assert m2["data_dir"] is None  # COW commit
    # exactly the import's partitions were written
    assert set(m2["tables"]["twins"]["parts"]) == {"model_id=dtmi%3Aj%3AThing;1"}
    assert set(m2["tables"]["relationships"]["parts"]) == {"name=next"}

    store, v = load_latest(spark, root)
    assert v == 2
    assert store.twins.count() == n and store.relationships.count() == n

    changes = read_changes_since(spark, root, after_version=1)
    assert changes.count() == 2 * n
    assert changes.filter("event_type = 'Insert'").count() == 2 * n

    router = EventRouter(source="src-cow")
    mem = InMemoryEventSink("mem")
    router.add_sink(mem)
    router.add_route(EventRoute("mem", "EventNotification"))
    q = run_change_stream(spark, root, router, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert len(mem.events) == 2 * n


def test_job_records_lifecycle_timestamps_and_purge():
    """job_records carry created/updated/finished/purge timestamps and
    purge_expired_jobs drops records (and their checkpoints) whose
    retention passed (JobService.cs:21,40-105,950-974; default
    retention 24 h)."""
    clock = [1000.0]
    svc = JobService(clock=lambda: clock[0], job_retention_s=100.0)
    rec = svc.register(JobRecord(id="j1"))
    assert rec.created_at == 1000.0
    assert rec.purge_at == 1100.0
    assert rec.finished_at is None
    clock[0] = 1050.0
    svc.finish(rec)
    assert rec.finished_at == 1050.0 and rec.updated_at == 1050.0
    svc.checkpoints["j1"] = ImportCheckpoint("j1")
    # not yet expired
    assert svc.purge_expired_jobs() == 0
    assert "j1" in svc.records
    # second record created later survives the purge that takes j1
    clock[0] = 1090.0
    svc.register(JobRecord(id="j2"))
    clock[0] = 1101.0
    assert svc.purge_expired_jobs() == 1
    assert "j1" not in svc.records and "j1" not in svc.checkpoints
    assert "j2" in svc.records


def test_import_run_stamps_timestamps(client):
    """An executed import job ends with created/finished stamps and a
    purge deadline one retention period after creation."""
    job = ImportJob(client)
    rec = job.run(full_file(), "job-ts")
    assert rec.created_at is not None
    assert rec.finished_at is not None and rec.finished_at >= rec.created_at
    assert rec.purge_at == rec.created_at + job.jobs.job_retention_s


def test_resume_keeps_original_creation_and_purge(client):
    """A resumed job keeps the FIRST registration's created_at and
    purge deadline (the reference stamps CreatedAt once at creation —
    resume must not slide retention forward)."""
    job = ImportJob(client)
    lines = full_file()
    rec1 = job.run(lines, "job-res-ts")
    created, purge = rec1.created_at, rec1.purge_at
    cp = job.jobs.checkpoints["job-res-ts"]
    rec2 = job.run(full_file(), "job-res-ts", resume_from=cp)
    assert rec2.created_at == created
    assert rec2.purge_at == purge
    assert rec2.finished_at is not None


def test_import_distributed_registers_with_job_service(client, spark, tmp_path):
    p = tmp_path / "imp.ndjson"
    p.write_text("\n".join(full_file(3)) + "\n")
    svc = JobService()
    rec = import_file_distributed(client, spark, str(p), job_service=svc)
    assert rec.id in svc.records
    assert rec.created_at is not None and rec.finished_at is not None
    assert rec.purge_at == rec.created_at + svc.job_retention_s


def test_import_distributed_failure_marks_record_failed(client, spark, tmp_path):
    """A failed distributed import must not leave a stuck-Running
    record: the exception propagates AND the record lands terminal."""
    bad_model = dict(MODEL, contents=[{"@type": "Nope", "name": "x"}])
    p = tmp_path / "bad.ndjson"
    p.write_text("\n".join(ndjson(
        {"Section": "Header"}, {"fileVersion": "1.0.0"},
        {"Section": "Models"}, bad_model,
    )) + "\n")
    svc = JobService()
    with pytest.raises(Exception):
        import_file_distributed(client, spark, str(p), job_service=svc)
    [rec] = svc.records.values()
    assert rec.status == "Failed"
    assert rec.finished_at is not None
    assert rec.errors


def test_failed_header_marks_job_failed_not_stuck_running(client):
    """A header-validation failure must not leave a permanently
    'Running' record blocking the job id with 409s until the 24 h
    purge — the reference marks the job Failed (ImportJob.cs:429-457)."""
    svc = JobService()
    with pytest.raises(ImportError_):
        ImportJob(client, svc).run(ndjson({"Section": "Models"}, MODEL), "job-hdr")
    rec = svc.records["job-hdr"]
    assert rec.status == "Failed"
    assert rec.finished_at is not None
    assert rec.errors and "Header" in rec.errors[0]["error"]


def test_export_ndjson_round_trip(client, spark, tmp_path):
    """r14: export_graph_ndjson emits the exact Import-Jobs format —
    export → import into an EMPTY store reproduces identical twins,
    relationships and models (byte-deterministic with ordered=True)."""
    from pg_age_digitaltwins_spark.jobs import export_graph_ndjson

    ImportJob(client).run(full_file(), "seed")
    out = tmp_path / "export.ndjson"
    counts = export_graph_ndjson(client.store, str(out))
    assert counts == {"models": 1, "twins": 5, "relationships": 5}

    fresh = DigitalTwinsSparkClient(GraphStore.empty(spark))
    rec = ImportJob(fresh).run(
        out.read_text().splitlines(), "round-trip"
    )
    assert rec.status == "Succeeded" and rec.error_count == 0

    def snapshot(c):
        tw = {
            r["dt_id"]: json.loads(r["doc"])
            for r in c.store.twins.select("dt_id", "doc").collect()
        }
        rl = {
            r["relationship_id"]: json.loads(r["doc"])
            for r in c.store.relationships.select(
                "relationship_id", "doc"
            ).collect()
        }
        md = {
            r["id"]: json.loads(r["model"])
            for r in c.store.models.select("id", "model").collect()
        }
        return tw, rl, md

    tw0, rl0, md0 = snapshot(client)
    tw1, rl1, md1 = snapshot(fresh)
    # stamps are rewritten on import; compare documents modulo them
    def strip(doc):
        d = dict(doc)
        meta = dict(d.get("$metadata", {}))
        meta.pop("$lastUpdateTime", None)
        for k, v in list(meta.items()):
            if isinstance(v, dict):
                meta[k] = {kk: vv for kk, vv in v.items()
                           if kk != "lastUpdateTime"}
        d["$metadata"] = meta
        d.pop("$etag", None)
        return d

    assert {k: strip(v) for k, v in tw0.items()} == {
        k: strip(v) for k, v in tw1.items()
    }
    assert {k: strip(v) for k, v in rl0.items()} == {
        k: strip(v) for k, v in rl1.items()
    }
    assert md0 == md1
    # deterministic: exporting the round-tripped store byte-matches a
    # re-export of the original modulo the rewritten stamps
    out2 = tmp_path / "export2.ndjson"
    export_graph_ndjson(fresh.store, str(out2))
    assert len(out2.read_text().splitlines()) == len(
        out.read_text().splitlines()
    )


def test_export_ndjson_distributed_parts(client, spark, tmp_path):
    """single_file=False writes executor-side part files whose ordered
    concatenation is a valid import stream."""
    import glob as _glob

    from pg_age_digitaltwins_spark.jobs import export_graph_ndjson

    ImportJob(client).run(full_file(), "seed")
    root = tmp_path / "exp"
    counts = export_graph_ndjson(
        client.store, str(root), single_file=False
    )
    assert counts["twins"] == 5 and counts["relationships"] == 5
    # r15: the docstring's ONE glob must reconstruct the full stream
    # (header/marker are single-part directories now, not top-level
    # files the glob would miss)
    assert _glob.glob(str(root / "*.ndjson")) == []
    lines: list[str] = []
    for part in sorted(_glob.glob(str(root / "*" / "part-*"))):
        with open(part) as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    fresh = DigitalTwinsSparkClient(GraphStore.empty(spark))
    rec = ImportJob(fresh).run(lines, "from-parts")
    assert rec.status == "Succeeded" and rec.error_count == 0
    assert fresh.store.twins.count() == 5
    assert fresh.store.relationships.count() == 5


def test_tpch_store_export_import_round_trip_exact(spark, tmp_path):
    """r15: the fixture store must re-import its OWN export exactly —
    demo models declare every twin property (validate_twin passes) and
    relationship ids are unique (the lineitem row_number disambiguator),
    so nothing is rejected and nothing is last-line-wins deduped away."""
    from pg_age_digitaltwins_spark.jobs import (
        export_graph_ndjson,
        import_file_distributed,
    )
    from pg_age_digitaltwins_spark.store.tpch_loader import load_graph

    store = load_graph(spark, "/root/testdata/sf0.001")
    client = DigitalTwinsSparkClient(store)
    f = str(tmp_path / "exp.ndjson")
    counts = export_graph_ndjson(store, f, single_file=True)
    fresh = DigitalTwinsSparkClient(GraphStore.empty(spark))
    rec = import_file_distributed(fresh, spark, f)
    assert rec.status == "Succeeded" and rec.error_count == 0
    assert fresh.store.twins.count() == counts["twins"]
    assert fresh.store.relationships.count() == counts["relationships"]
    cols = ["source_id", "relationship_id", "target_id", "name"]
    a, b = store.relationships.select(*cols), fresh.store.relationships.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the unique-PK invariant itself
    assert (
        store.relationships.select("source_id", "relationship_id")
        .distinct()
        .count()
        == counts["relationships"]
    )
