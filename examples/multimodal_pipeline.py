"""End-to-end multimodal curation pipeline over the binary-column seam:

  synthetic WAV/PPM media (real RIFF / binary-P6 bytes) →
  exact-integer audio stats → clipping / silence gates →
  PCM16 resample to the training rate →
  image metadata + nearest-neighbor resize →
  per-kind corpus summary.

Every stage is the package's production shape: Arrow ``mapInPandas``
over opaque binary columns (bytes never leave executors), typed
metadata projected for filtering, and the decode kernels real (PPM,
PCM16 WAV) with unsupported codecs raising instead of corrupting.
Swap the synthetic generators for `spark.read.format("binaryFile")`
and the kernels for libvips/soxr in production — the schemas,
partitioning, and batch shapes are identical.

Run: python examples/multimodal_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_age_digitaltwins_spark import get_spark
from pg_age_digitaltwins_spark.operators import multimodal
from pg_age_digitaltwins_spark.store.tpch_loader import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR)["documents"]

    # 1. audio: real RIFF bytes → exact-integer loudness stats
    wavs = multimodal.synthetic_wav_media(docs)
    stats = multimodal.audio_stats(wavs)
    n_audio = stats.count()

    # 2. quality gates on the integer stats — the clipping filter
    #    (peak at int16 full scale) and the silence filter (tiny RMS):
    #    rms² = sum_squares / n; compare in integer space
    #    (sum_squares · 1 vs n · threshold²) — no float drift
    clip_free = stats.filter(F.col("peak_abs") < 32767)
    loud_enough = clip_free.filter(
        F.col("sum_squares") > F.col("n_samples") * F.lit(100 * 100)
    )
    kept = loud_enough.count()
    print(f"audio: {n_audio} clips, {kept} pass clip+silence gates")

    # 3. resample survivors to the training rate (real PCM16 kernel)
    survivors = wavs.join(loud_enough.select("media_id"), "media_id")
    resampled = multimodal.resample_wav(survivors, rate=4000)
    print(
        "resampled:",
        resampled.agg(
            F.count("*").alias("n"),
            F.sum("n_samples").alias("total_samples"),
        ).collect()[0],
    )

    # 4. images: binary-P6 metadata + nearest-neighbor resize
    ppms = multimodal.synthetic_ppm_media(docs)
    resized = multimodal.resize_ppm(ppms, width=12, height=8)
    print(
        "images:",
        resized.agg(
            F.count("*").alias("n"),
            F.sum(F.length("content")).alias("total_bytes"),
        ).collect()[0],
    )
    spark.stop()


if __name__ == "__main__":
    main()
