"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Design for 100 TB: media bytes live in a ``binary`` column (or a
pointer column to object storage) beside typed metadata columns; all
transforms are Arrow-batched ``mapInPandas`` so bytes never leave the
executor and never materialize on the driver.  The decode kernels
themselves are STUBBED (no image/audio libraries in this container):
``decode_fn`` defaults to a deterministic fake that derives pseudo
width/height/duration from the byte content, so the Spark-side plumbing
— schema, batching, partitioning, UDF signature — is real and tested,
and a production deploy swaps in PIL/ffmpeg by passing ``decode_fn``.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic media fixture: document text bytes become the
    opaque payload (stands in for real image/audio blobs; the engine
    treats content as opaque either way)."""
    return documents.select(
        F.concat(F.lit("media-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def _fake_decode(kind: str, content: bytes) -> dict[str, Any]:
    """Deterministic stand-in decoder.  Production: replace with
    PIL.Image.open / soundfile / pyav — same signature, same plumbing.
    Raises NotImplementedError for unknown kinds like a real decoder
    would for an unsupported codec."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"No decoder for media kind {kind!r}")
    h = hashlib.sha256(content or b"").digest()
    width = 16 + h[0] % 64 if kind in ("image", "video") else None
    height = 16 + h[1] % 64 if kind in ("image", "video") else None
    duration = (1000 + int.from_bytes(h[2:4], "big")) if kind in ("audio", "video") else None
    return {"width": width, "height": height, "duration_ms": duration}


def stdlib_decode(kind: str, content: bytes) -> dict[str, Any]:
    """REAL decoder for container-friendly formats — pure stdlib, no
    native deps: WAV (RIFF chunk walk → sample rate/channels/bits →
    duration), BMP (BITMAPINFOHEADER → width/height), and binary PPM
    (P6 ASCII header → width/height).  Anything else raises
    ``NotImplementedError`` exactly like a production decoder hitting
    an unsupported codec — pass ``decode_fn=stdlib_decode`` to
    ``decode_media`` to run genuine format parsing through the same
    Arrow-batched seam the fake exercises."""
    import struct as _struct

    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        # chunk walk: each chunk = 4-byte id + uint32 LE size + payload
        # (word-aligned).  fmt  gives the rate math, data gives the
        # payload size; duration = data_bytes / byte_rate.
        pos, byte_rate, data_size = 12, None, None
        while pos + 8 <= len(content):
            cid = content[pos : pos + 4]
            (csize,) = _struct.unpack_from("<I", content, pos + 4)
            if cid == b"fmt " and pos + 24 <= len(content):
                _fmt, _ch, _rate, brate = _struct.unpack_from(
                    "<HHII", content, pos + 8
                )
                byte_rate = brate
            elif cid == b"data":
                data_size = csize
            pos += 8 + csize + (csize & 1)
        if byte_rate is None or data_size is None:
            raise NotImplementedError("malformed WAV: missing fmt /data chunk")
        return {
            "width": None,
            "height": None,
            "duration_ms": int(data_size * 1000 // max(byte_rate, 1)),
        }
    if content[:2] == b"BM" and len(content) >= 26:
        # BITMAPINFOHEADER: int32 LE width at 18, int32 LE height at 22
        # (negative height = top-down row order).
        (width,) = _struct.unpack_from("<i", content, 18)
        (height,) = _struct.unpack_from("<i", content, 22)
        return {"width": abs(width), "height": abs(height), "duration_ms": None}
    if content[:2] == b"P6":
        # binary PPM: "P6" <ws> width <ws> height <ws> maxval, with
        # '#' comment lines allowed anywhere in the header
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 2 and pos < len(content):
            c = content[pos : pos + 1]
            if c == b"#":
                while pos < len(content) and content[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            elif c.isdigit():
                start = pos
                while pos < len(content) and content[pos : pos + 1].isdigit():
                    pos += 1
                tokens.append(int(content[start:pos]))
            else:
                raise NotImplementedError("malformed PPM header")
        if len(tokens) < 2:
            raise NotImplementedError("malformed PPM header")
        return {"width": tokens[0], "height": tokens[1], "duration_ms": None}
    raise NotImplementedError(
        f"no stdlib decoder for magic {content[:4]!r} (kind={kind!r})"
    )


def decode_media(
    media: DataFrame,
    decode_fn: Callable[[str, bytes], dict[str, Any]] = _fake_decode,
) -> DataFrame:
    """Binary → typed metadata.

    ``n_bytes``/``sha256`` are built-in column functions (JVM-side,
    whole-stage codegen — no reason to pay the Python tax for byte
    counting); only the genuine codec work (``decode_fn``) runs in the
    Arrow-batched ``mapInPandas`` stage.  Partition-preserving; no
    shuffle, no driver transfer."""
    prepared = media.select(
        "media_id",
        "kind",
        "content",
        F.coalesce(F.length("content"), F.lit(0)).cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.coalesce(F.col("content"), F.lit(b"")), 256)).alias("sha256"),
    )

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                meta = decode_fn(r.kind, content)
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": r.n_bytes,
                        "sha256": r.sha256,
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "duration_ms": meta.get("duration_ms"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return prepared.mapInPandas(run, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-level feature vector (deterministic fake embedding — the
    production swap-in is a vision/audio model over the same batches).
    Shape and batching are the real thing: array<float> column out,
    Arrow transfer, partition-preserving."""

    def run(batches: Iterable) -> Iterator:
        import hashlib as hl

        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                h = hl.sha256(content).digest()
                rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
                feats.append((rng % 1000).astype("float32") / 1000.0)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [f.tolist() for f in feats]}
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("in_width", T.IntegerType(), True),
        T.StructField("in_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def synthetic_ppm_media(documents: DataFrame) -> DataFrame:
    """Deterministic binary-P6 fixture: per document, a gradient image
    with ``width = 4 + doc_id % 8`` and ``height = 4 + (doc_id // 8) %
    8`` and pixel (r, c) = (r % 256, c % 256, (r + c) % 256) — REAL
    PPM bytes (header + raw RGB) built executor-side, so the resize
    kernel parses and rescales genuine raster payloads."""

    def run(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                w = 4 + int(doc_id) % 8
                h = 4 + (int(doc_id) // 8) % 8
                r = np.arange(h, dtype=np.uint32)[:, None] % 256
                c = np.arange(w, dtype=np.uint32)[None, :] % 256
                px = np.stack(
                    [
                        np.broadcast_to(r, (h, w)),
                        np.broadcast_to(c, (h, w)),
                        (r + c) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                content = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
                rows.append(
                    {"media_id": f"media-{int(doc_id)}", "kind": "image",
                     "content": content,
                     "content_type": "image/x-portable-pixmap"}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return documents.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


def _parse_ppm(content: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, pixel_offset) of a binary P6 payload —
    '#' comments legal anywhere in the header, exactly one whitespace
    byte after maxval before the raster."""
    if content[:2] != b"P6":
        raise NotImplementedError(
            f"resize supports binary PPM only (magic {content[:2]!r})"
        )
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3 and pos < len(content):
        c = content[pos : pos + 1]
        if c == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(content) and content[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(content[start:pos]))
        else:
            raise NotImplementedError("malformed PPM header")
    if len(tokens) < 3:
        raise NotImplementedError("malformed PPM header")
    # r12 (ADVICE): a 2-byte-per-sample raster (maxval > 255) would
    # silently decode as 1-byte samples and produce a corrupt resize —
    # refuse it like any other unsupported codec.
    if not 1 <= tokens[2] <= 255:
        raise NotImplementedError(
            f"resize supports 8-bit PPM only (maxval {tokens[2]})"
        )
    return tokens[0], tokens[1], tokens[2], pos + 1


def resize_ppm(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor image resize for binary-PPM payloads (the
    brief's `resize` kernel) — pure numpy index selection over the
    decoded raster, re-encoded as P6; non-PPM payloads raise
    ``NotImplementedError`` like a production resizer hitting an
    unsupported codec (swap the kernel for PIL in production — the
    Arrow-batched ``mapInPandas`` seam is identical).

    100 TB shape: partition-preserving map stage; bytes stay on the
    executors; output size is bounded by the target dims, independent
    of input resolution."""

    def run(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                w0, h0, maxval, off = _parse_ppm(content)
                px = np.frombuffer(
                    content, dtype=np.uint8, count=w0 * h0 * 3, offset=off
                ).reshape(h0, w0, 3)
                rid = (np.arange(height) * h0) // height
                cid = (np.arange(width) * w0) // width
                out = px[rid][:, cid]
                payload = (
                    f"P6\n{width} {height}\n{maxval}\n".encode()
                    + out.tobytes()
                )
                rows.append(
                    {"media_id": r.media_id, "in_width": w0, "in_height": h0,
                     "width": width, "height": height, "content": payload}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        run, RESIZED_SCHEMA
    )


WAV_RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("in_rate", T.IntegerType(), True),
        T.StructField("in_samples", T.IntegerType(), True),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def synthetic_wav_media(documents: DataFrame, rate: int = 8000) -> DataFrame:
    """Deterministic PCM16 mono WAV fixture: per document,
    ``64 + doc_id % 64`` samples with sample[i] = ((doc_id·31 + i·17)
    mod 65536) − 32768 — REAL RIFF bytes (fmt + data chunks) built
    executor-side, so the resample kernel walks genuine containers."""

    def run(batches: Iterable) -> Iterator:
        import struct as _struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 64 + d % 64
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 31 + i * 17) % 65536 - 32768).astype("<i2")
                data = samples.tobytes()
                byte_rate = rate * 2  # mono, 16-bit
                hdr = (
                    b"RIFF"
                    + _struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
                    + b"data"
                    + _struct.pack("<I", len(data))
                )
                rows.append(
                    {"media_id": f"media-{d}", "kind": "audio",
                     "content": hdr + data, "content_type": "audio/wav"}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return documents.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


def _parse_wav_pcm16(content: bytes) -> tuple[int, int, int, int]:
    """(rate, n_channels, data_offset, data_size) of a PCM16 RIFF/WAVE
    payload — raises ``NotImplementedError`` for non-RIFF containers,
    compressed formats, or bit depths other than 16 (decoding them as
    int16 would silently corrupt the resample, the maxval>255 PPM
    lesson)."""
    import struct as _struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            f"resample supports RIFF/WAVE only (magic {content[:4]!r})"
        )
    pos, rate, ch, bits, fmt = 12, None, None, None, None
    data_off, data_size = None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (csize,) = _struct.unpack_from("<I", content, pos + 4)
        if cid == b"fmt " and pos + 24 <= len(content):
            fmt, ch, rate, _br, _ba, bits = _struct.unpack_from(
                "<HHIIHH", content, pos + 8
            )
        elif cid == b"data":
            data_off, data_size = pos + 8, csize
        pos += 8 + csize + (csize & 1)
    if rate is None or data_off is None:
        raise NotImplementedError("malformed WAV: missing fmt /data chunk")
    if fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"resample supports PCM16 only (format {fmt}, {bits}-bit)"
        )
    return int(rate), int(ch), data_off, int(data_size)


def resample_wav(media: DataFrame, rate: int) -> DataFrame:
    """REAL nearest-sample audio resample for PCM16 WAV payloads (the
    audio sibling of :func:`resize_ppm`) — numpy index selection per
    channel-interleaved frame, re-encoded as PCM16 at ``rate``;
    non-WAV / non-PCM16 payloads raise like an unsupported codec
    (swap for soxr/librosa in production — the Arrow seam and batch
    shape are identical).

    100 TB shape: partition-preserving map stage, bytes never leave
    the executors, output size bounded by rate·duration regardless of
    input rate."""

    def run(batches: Iterable) -> Iterator:
        import struct as _struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                in_rate, ch, off, size = _parse_wav_pcm16(content)
                frames = size // (2 * ch)
                pcm = np.frombuffer(
                    content, dtype="<i2", count=frames * ch, offset=off
                ).reshape(frames, ch)
                out_n = (frames * rate) // in_rate
                idx = (np.arange(out_n, dtype=np.int64) * in_rate) // rate
                out = pcm[idx]
                data = out.astype("<i2").tobytes()
                hdr = (
                    b"RIFF"
                    + _struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + _struct.pack(
                        "<IHHIIHH", 16, 1, ch, rate, rate * 2 * ch, 2 * ch, 16
                    )
                    + b"data"
                    + _struct.pack("<I", len(data))
                )
                rows.append(
                    {"media_id": r.media_id, "in_rate": in_rate,
                     "in_samples": frames, "rate": rate,
                     "n_samples": int(out_n), "content": hdr + data}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_RESAMPLED_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(
        run, WAV_RESAMPLED_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame sampling stub: one row per sampled offset (video → frames).
    Plumbing real (explode → one row per frame, offset metadata);
    decode stubbed as byte-slice hashes."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.length("content") - 1) / every_n_bytes, F.lit(0)
                ).cast("int"),
            )
        ).alias("frame_no"),
        F.length("content").alias("n_bytes"),
    )
    return frames.withColumn(
        "frame_key",
        F.sha2(F.concat_ws(":", F.col("media_id"), F.col("frame_no")), 256),
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """(media_id, rate, n_channels, n_samples, sum_samples,
    sum_squares, peak_abs) — loudness/energy statistics decoded from
    REAL PCM16 WAV bytes (RMS = sqrt(sum_squares/n) and peak are the
    clipping / silence / corruption filters every audio-corpus
    pipeline runs before training).

    Exactness: every statistic is an INTEGER aggregate over the
    decoded int16 samples (sum, sum of squares, max |s|) — no float
    anywhere — so a synthetic fixture whose samples derive from a
    closed-form formula value-checks the whole container walk +
    decode end to end (the resample oracle pattern, applied to the
    sample VALUES instead of the header).

    100 TB shape: partition-preserving Arrow ``mapInPandas``; bytes
    never leave executors; output is one short row per media item."""

    def run(batches: Iterable) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, ch, off, size = _parse_wav_pcm16(bytes(content))
                samples = np.frombuffer(
                    bytes(content), dtype="<i2", count=size // 2, offset=off
                ).astype(np.int64)
                rows.append(
                    {
                        "media_id": mid,
                        "rate": rate,
                        "n_channels": ch,
                        "n_samples": int(len(samples) // ch),
                        "sum_samples": int(samples.sum()),
                        "sum_squares": int((samples * samples).sum()),
                        "peak_abs": int(np.abs(samples).max()) if len(samples) else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "rate", "n_channels", "n_samples",
                    "sum_samples", "sum_squares", "peak_abs",
                ],
            )

    schema = (
        "media_id string, rate int, n_channels int, n_samples int, "
        "sum_samples long, sum_squares long, peak_abs long"
    )
    return media.select("media_id", "content").mapInPandas(run, schema)
