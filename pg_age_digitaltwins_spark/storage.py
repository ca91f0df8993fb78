"""Blob-storage routing for job input/output URIs.

Reference parity: ``src/AgeDigitalTwins.ApiService/Services/
BlobStorageServiceRouter.cs`` routes each blob URI to a provider
implementation by scheme/host (Azure host ``blob.core.windows.net``,
``s3``/``s3.amazonaws.com`` → S3, ``gs``/``storage.googleapis.com`` →
GCS, anything else → default local), and the import/delete job
endpoints stream job inputs and structured job logs through it.

Spark-first mapping: on a cluster the right way to read a cloud blob
is NOT a driver-side byte stream but the Hadoop filesystem connector —
``spark.read.text("s3a://bucket/key")`` parallelizes the scan and
pushes it to executors.  So this router does two jobs:

* :meth:`BlobStorageRouter.spark_path` — translate a user-facing blob
  URI into the hadoop-FS path a Spark job would read at scale
  (``s3://b/k`` → ``s3a://b/k``, Azure blob HTTPS URL →
  ``abfss://container@account.dfs.core.windows.net/key``);
* driver-side line streams (:meth:`open_read_lines` /
  :meth:`write_lines`) for the small control-plane files the reference
  streams (NDJSON import input, job logs) — real for ``file://`` and
  plain paths; cloud providers raise a clear error unless a backend is
  registered (the cloud SDKs are absent from this container), exactly
  like the reference's per-provider service classes but pluggable.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator
from urllib.parse import urlparse


class BlobStorageError(RuntimeError):
    pass


class BlobStorageRouter:
    """Scheme/host-based provider routing (BlobStorageServiceRouter.cs:31-39)."""

    def __init__(self) -> None:
        self._readers: dict[str, Callable[[str], Iterator[str]]] = {}
        self._writers: dict[str, Callable[[str, Iterable[str]], None]] = {}

    # -- detection (mirrors DetectProvider) ----------------------------
    @staticmethod
    def detect_provider(uri: str) -> str:
        p = urlparse(uri)
        host = (p.netloc or "").lower()
        scheme = (p.scheme or "").lower()
        if "blob.core.windows.net" in host:
            return "azure"
        if "s3.amazonaws.com" in host or scheme == "s3":
            return "s3"
        if "storage.googleapis.com" in host or scheme == "gs":
            return "gcs"
        return "default"

    # -- the scale path ------------------------------------------------
    @staticmethod
    def spark_path(uri: str) -> str:
        """The hadoop-FS path a distributed Spark read would use for
        this blob URI — hand this to ``spark.read`` on a cluster with
        the matching connector on the classpath."""
        p = urlparse(uri)
        provider = BlobStorageRouter.detect_provider(uri)
        if provider == "s3":
            if p.scheme.lower() == "s3":
                return f"s3a://{p.netloc}{p.path}"
            # https://bucket.s3.amazonaws.com/key or s3.amazonaws.com/bucket/key
            host = p.netloc.lower()
            if host == "s3.amazonaws.com":
                return f"s3a:/{p.path}"
            bucket = p.netloc.split(".")[0]
            return f"s3a://{bucket}{p.path}"
        if provider == "gcs":
            if p.scheme.lower() == "gs":
                return uri
            return f"gs:/{p.path}" if p.netloc.lower() == "storage.googleapis.com" else uri
        if provider == "azure":
            # https://account.blob.core.windows.net/container/key →
            # abfss://container@account.dfs.core.windows.net/key
            account = p.netloc.split(".")[0]
            parts = p.path.lstrip("/").split("/", 1)
            container = parts[0] if parts else ""
            key = parts[1] if len(parts) > 1 else ""
            return f"abfss://{container}@{account}.dfs.core.windows.net/{key}"
        if p.scheme.lower() == "file":
            return p.path
        return uri

    # -- pluggable driver-side streams ---------------------------------
    def register(
        self,
        provider: str,
        reader: Callable[[str], Iterator[str]] | None = None,
        writer: Callable[[str, Iterable[str]], None] | None = None,
    ) -> None:
        if reader is not None:
            self._readers[provider] = reader
        if writer is not None:
            self._writers[provider] = writer

    @staticmethod
    def _local_path(uri: str) -> str:
        return uri[len("file://") :] if uri.startswith("file://") else uri

    def open_read_lines(self, uri: str) -> Iterator[str]:
        provider = self.detect_provider(uri)
        if provider in self._readers:
            return self._readers[provider](uri)
        if provider == "default":
            def gen() -> Iterator[str]:
                with open(self._local_path(uri)) as f:
                    for line in f:
                        yield line.rstrip("\n")
            return gen()
        raise BlobStorageError(
            f"no {provider} blob backend available in this environment — "
            f"register one (BlobStorageRouter.register({provider!r}, ...)) "
            f"or run the distributed path against {self.spark_path(uri)!r}"
        )

    def write_lines(self, uri: str, lines: Iterable[str]) -> None:
        provider = self.detect_provider(uri)
        if provider in self._writers:
            self._writers[provider](uri, lines)
            return
        if provider == "default":
            with open(self._local_path(uri), "w") as f:
                for line in lines:
                    f.write(line + "\n")
            return
        raise BlobStorageError(
            f"no {provider} blob backend available in this environment — "
            f"register one (BlobStorageRouter.register({provider!r}, ...))"
        )
