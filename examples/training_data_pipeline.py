"""End-to-end LLM training-data pipeline over the documents corpus:

    quality signals → Gopher repetition rules → exact dedup →
    two-phase LSH near-dedup → benchmark decontamination →
    per-source mixture sampling → sliding-window chunking →
    sequence packing → leakage-safe train/val split

Every stage is a distributed DataFrame program (no driver loops); the
printed funnel shows per-stage survivor counts.

Run:  python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_age_digitaltwins_spark import get_spark
from pg_age_digitaltwins_spark.operators import sampling, similarity, text
from pg_age_digitaltwins_spark.store.tpch_loader import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, SF_DIR)["documents"]
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality + repetition filters (Gopher-style rules)
    quality = text.quality_scores(docs)
    rep = text.dup_ngram_stats(docs, n=2)
    keep = (
        docs.join(quality, "doc_id")
        .join(rep.select("doc_id", "dup_char_frac"), "doc_id")
        .filter(
            (F.col("mean_word_len").between(2, 12))
            & (F.col("dup_char_frac") < 0.95)
        )
        .select(docs["*"])
    )
    n1 = keep.count()
    print(f"quality+repetition: {n1} kept ({n0 - n1} dropped)")

    # 2. exact dedup (fingerprint keep-one)
    fp = text.fingerprints(keep)
    first = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    keep = keep.join(first.select("doc_id"), "doc_id", "semi")
    n2 = keep.count()
    print(f"exact dedup: {n2} kept ({n1 - n2} exact dups)")

    # 2b. cross-document repeated-span report (Lee et al. substring-
    #     dedup signal): boilerplate that whole-doc dedup misses
    spans = text.repeated_spans(keep, window=16, min_docs=2)
    n_spans = spans.count()
    top = spans.orderBy(F.desc("n_docs")).limit(1).collect()
    if top:
        print(
            f"repeated spans: {n_spans} boilerplate spans "
            f"(widest in {top[0]['n_docs']} docs)"
        )
    else:
        print("repeated spans: none")

    # 3. near-dedup: LSH candidates verified by exact Jaccard;
    #    drop the higher doc_id of each verified pair
    pairs = similarity.minhash_lsh_verified_pairs(keep, threshold=0.5)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    keep = keep.join(losers, "doc_id", "anti")
    n3 = keep.count()
    print(f"near dedup: {n3} kept ({n2 - n3} near dups)")

    # 3b. containment sweep (r12): sub-document duplication —
    #     partial copies/quotes that the symmetric Jaccard pass above
    #     leaves behind (short doc inside long doc); drop the CONTAINED
    #     side (doc_a, the one whose grams are swallowed)
    contained = (
        text.ngram_containment_pairs(keep, n=3, threshold=0.9)
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    keep = keep.join(contained, "doc_id", "anti")
    n3b = keep.count()
    print(f"containment sweep: {n3b} kept ({n3 - n3b} contained docs)")

    # 3c. trained quality filter (r12): averaged-perceptron domain
    #     classifier — train on a planted linear concept here (a real
    #     pipeline trains on labeled quality judgments), keep docs the
    #     model scores positive
    gate = text.classifier_gate(keep).collect()[0]
    print(
        f"quality classifier: held-out accuracy {gate['accuracy']} "
        f"(floor met: {gate['meets_floor']})"
    )

    # 4. decontamination vs a held-out benchmark set (returns the
    #    contaminated ids; anti-join them away)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    contaminated = text.decontaminate(keep, bench, n=8)
    keep = keep.join(contaminated.select("doc_id"), "doc_id", "anti")
    n4 = keep.count()
    print(f"decontaminated: {n4} kept ({n3 - n4} contaminated)")

    # 5. per-source token-budget mixture
    mix = sampling.mixture_sample(
        keep, {f"src{i}": 5_000 for i in range(0, 20, 2)}
    )
    n5 = mix.count()
    tok = mix.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"mixture: {n5} docs, {tok} tokens across sampled sources")

    # 6. chunk into training windows and pack fixed-budget sequences
    sampled = keep.join(mix.select(F.col("key").alias("doc_id")), "doc_id")
    chunks = text.chunk_documents(sampled, window=128, stride=96)
    n6 = chunks.count()
    packed = text.pack_sequences(
        chunks.select(
            (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        budget=512,
    )
    n7 = packed.select("bucket", "pack_no").distinct().count()
    print(f"chunks: {n6} → packed sequences: {n7}")

    # 7. leakage-safe split: exact-duplicate groups never straddle
    splits = sampling.leakage_safe_split(sampled, test_fraction=0.1)
    per = {r["split"]: r["n"] for r in splits.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    print(f"splits: {per}")
    spark.stop()


if __name__ == "__main__":
    main()
