"""Graph analytics through the r14 Cypher procedure-call surface:

  load the TPC-H twin graph →
  CALL graph.degree()             — pre-flight hub check →
  CALL graph.pageRank(5)          — global importance →
  CALL graph.personalizedPageRank — related-entities from two seeds →
  CALL graph.harmonicCentrality   — reach from the nation hubs →
  batch soft-dedup of the documents feeding the next training round
  (dup_downweight: one expected survivor per duplicate group)

The point of the surface: an analyst writes ONE Cypher string per
question instead of importing operators — while the compiler dispatches
to the same scale-shaped analytics operators underneath (broadcast-gated
PageRank supersteps, degree-ordered wedge joins, md5-deterministic
sampling).

Run: python examples/graph_procedures_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_age_digitaltwins_spark import DigitalTwinsSparkClient, get_spark
from pg_age_digitaltwins_spark.operators.sampling import dup_downweight
from pg_age_digitaltwins_spark.store.tpch_loader import load_graph, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("graph-procedures")
    spark.sparkContext.setLogLevel("ERROR")
    client = DigitalTwinsSparkClient(load_graph(spark, sf_dir))

    hubs = client.query(
        "CALL graph.degree() YIELD node, out_degree, in_degree "
        "RETURN node, out_degree + in_degree AS degree "
        "ORDER BY degree DESC LIMIT 5"
    ).rows
    print("top hubs:", hubs)

    top_rank = client.query(
        "CALL graph.pageRank(5) YIELD node, rank "
        "RETURN node, round(rank, 6) AS rank ORDER BY rank DESC LIMIT 5"
    ).rows
    print("top pagerank:", top_rank)

    related = client.query(
        "CALL graph.personalizedPageRank(['cust-0', 'cust-1'], 4) "
        "YIELD node, rank WHERE rank > 0 "
        "RETURN node, round(rank, 6) AS rank ORDER BY rank DESC LIMIT 8"
    ).rows
    print("related to cust-0/cust-1:", related)

    typed = client.query(
        "CALL graph.connectedComponents(['locatedIn', 'partOf']) "
        "YIELD node, component RETURN count(DISTINCT component) AS regions"
    ).rows
    print("components of the geography subgraph:", typed)

    reach = client.query(
        "CALL graph.harmonicCentrality(['nation-0', 'nation-1'], 3) "
        "YIELD node, h12 RETURN count(*) AS n_reached_any, max(h12) AS max_h12"
    ).rows
    print("harmonic reach:", reach)

    docs = load_tables(spark, sf_dir)["documents"]
    weighted = dup_downweight(docs)
    kept = weighted.filter("kept").count()
    groups = weighted.select("doc_id").count()
    print(f"soft dedup: kept {kept} of {groups} documents "
          "(one expected survivor per duplicate group)")
    spark.stop()


if __name__ == "__main__":
    main()
