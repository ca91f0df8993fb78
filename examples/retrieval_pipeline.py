"""End-to-end retrieval-curation pipeline over the embedding table:

  corpus embeddings →
  cluster-quality gate (centroid silhouette per label) →
  batched binary-code ANN (one corpus code build, N queries) →
  MMR diversity rerank of each query's candidates →
  contrastive hard-negative mining for the picked anchors →
  temperature-balanced mixture of the documents feeding the next
  training round.

Every stage is the package's production shape: the corpus is scanned
once per index build (16× smaller as packed sign codes), query sides
broadcast, the greedy MMR stages run on pool-sized frames, and the
mixture quotas are exact BIGINT arithmetic — nothing here degrades at
1000 executors.

Run: python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_age_digitaltwins_spark import get_spark
from pg_age_digitaltwins_spark.operators import sampling, similarity
from pg_age_digitaltwins_spark.store.tpch_loader import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    emb, docs = t["embeddings"], t["documents"]

    # 1. index health: per-label centroid silhouette (a collapsed or
    #    mislabeled cluster shows up as a low/negative mean here)
    sil = similarity.label_silhouette(emb)
    print("cluster silhouette per label:")
    for r in sil.orderBy("label").collect():
        print(f"  label {r['label']}: n={r['n_points']} "
              f"mean_s={r['mean_silhouette']}")

    # 2. batched ANN: one packed-sign-code corpus build serves all
    #    queries (popcount-XOR prescreen + exact cosine re-rank)
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = similarity.ann_hamming_search_batch(emb, queries, k=10, refine_k=50)
    print(f"ANN candidates: {ann.count()} rows "
          f"({queries.count()} queries x top-10)")

    # 3. diversity rerank: MMR picks 3 per query (near-duplicate hits
    #    stop crowding the top slots)
    for qid in (0, 1, 2):
        picks = similarity.mmr_select(emb, qid, k=3, lam=0.7, pool=50)
        ids = [r["vec_id"] for r in picks.orderBy("rank").collect()]
        print(f"  query {qid}: MMR top-3 -> {ids}")

    # 4. contrastive hard negatives for training the next retriever
    hard = similarity.hard_negative_mining(emb, k=5, anchor_stride=50)
    print(f"hard negatives mined: {hard.count()} rows")

    # 5. temperature-balanced document mixture for the next round
    #    (α = 0.5 upweights rare sources with exact integer quotas)
    mix = sampling.temperature_quota_sample(docs, budget=200)
    print("mixture quotas by source:")
    for r in mix.groupBy("source").count().orderBy("source").collect():
        print(f"  {r['source']}: {r['count']}")

    spark.stop()


if __name__ == "__main__":
    main()
