"""End-to-end graph-embedding corpus pipeline over the twin graph:

    deterministic random walks (DeepWalk) →
    node2vec p/q-biased walks →
    skip-gram (center, context) pair corpus →
    int8 quantization + JL sign projection of node features →
    LSH-bucketed ANN over the projected space

Every stage is a distributed DataFrame program and every stochastic
choice is md5-derived — rerunning the pipeline on any engine
reproduces the identical corpus (the property that lets the driver
value-check the same operators against DuckDB).

Run:  python examples/graph_embeddings_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_age_digitaltwins_spark import get_spark
from pg_age_digitaltwins_spark.operators import similarity
from pg_age_digitaltwins_spark.operators.graph_analytics import (
    embedding_neighbor_recall,
    node2vec_walks,
    node_embeddings_ri,
    node_embeddings_sgd,
    random_walks,
    walk_skipgram_pairs,
)
from pg_age_digitaltwins_spark.store.tpch_loader import load_graph, load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("graph-embeddings-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    store = load_graph(spark, SF_DIR)

    # 1. walk corpus from the order twins (order→{cust,part,supp}→
    #    nation→region gives real 4-step trajectories)
    starts = store.twins.filter(
        F.col("dt_id").startswith("order-")
        & (F.element_at(F.split("dt_id", "-"), 2).cast("long") % 20 == 0)
    ).select("dt_id")
    walks = random_walks(store.relationships, starts, steps=4,
                         walks_per_node=2)
    print(f"DeepWalk corpus: {walks.count()} (walk, step) rows")

    # 2. the biased variant: q > p favors outward (DFS-ish) exploration
    biased = node2vec_walks(store.relationships, starts, steps=4,
                            walks_per_node=1, p=2, q=3)
    print(f"node2vec corpus: {biased.count()} rows")

    # 3. skip-gram pairs — the word2vec trainer input
    pairs = walk_skipgram_pairs(walks.unionByName(biased), window=2)
    top = pairs.orderBy(F.desc("n_pairs")).limit(3).collect()
    print(f"skip-gram pairs: {pairs.count()} distinct (center, context)")
    for r in top:
        print(f"  {r['center']} ↔ {r['context']}: {r['n_pairs']}")

    # 3b. TRAIN node embeddings from the pair corpus (r12) — the stage
    #     between the corpus and the ANN consumers: random indexing
    #     (exact BIGINT, distributed at any vocab) and SGNS word2vec
    #     (gradient trainer, vocab-bounded), both md5-deterministic,
    #     both scored against the exact co-occurrence geometry
    pairs = pairs.localCheckpoint()
    node_emb = node_embeddings_ri(pairs, dim=16)
    print(f"RI node embeddings: {node_emb.count()} x 16 (exact BIGINT)")
    sgd_emb = node_embeddings_sgd(pairs, dim=16, epochs=10, lr=0.5,
                                  negative=3, shards=8)
    for row in (
        embedding_neighbor_recall(pairs, node_emb, method="ri")
        .unionByName(
            embedding_neighbor_recall(pairs, sgd_emb, method="sgd",
                                      truth_weighting="ppmi", floor=0.25)
        )
        .collect()
    ):
        print(f"  trainer {row['method']}: recall@5 {row['recall_at_k']}"
              f" meets_floor={row['meets_floor']}")

    # 3c. the trained node embeddings feed the SAME compression path
    #     as any embedding column: int8 quantize + LSH bucketing
    node_vecs = node_emb.select(
        F.col("dt_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("float")).alias(
            "embedding"
        ),
    )
    node_proj = similarity.random_projection_int8(
        node_vecs, out_dim=8, in_dim=16
    )
    print(f"projected node embeddings: {node_proj.count()} x 8")

    # 4. compress the (pre-trained, here: fixture) embedding table —
    #    int8 scalar quantization then a 16-dim JL sign projection, all
    #    exact integer arithmetic
    emb = load_tables(spark, SF_DIR)["embeddings"]
    proj = similarity.random_projection_int8(emb, out_dim=16, in_dim=64)
    print(f"projected embeddings: {proj.count()} x 16 (exact BIGINT)")

    # 5. ANN over the original space, LSH-bucketed (the scale path)
    hits = similarity.ann_lsh_search(emb, query_id=0, k=5, n_bits=8)
    print("LSH ANN top-5 for vec 0:")
    for r in hits.collect():
        print(f"  vec {r['vec_id']}: cos {r['sim']:.4f}")

    # 6. the cheapest first-pass filter: 1-bit sign codes + popcount
    #    Hamming prescreen (16x compressed scan), exact re-rank — the
    #    r12 binary-code path; prescreen is exact integers end to end
    bits = similarity.ann_hamming_search(emb, query_id=0, k=5, refine_k=25)
    print("Hamming-prescreen ANN top-5 for vec 0:")
    for r in bits.collect():
        print(f"  vec {r['vec_id']}: cos {r['sim']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
