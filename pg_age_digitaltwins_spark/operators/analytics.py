"""Graph-wide analytic rollups (Cypher aggregate parity, SURVEY.md §2.2
C5): plain groupBy/agg over the store tables — map-side partial
aggregation + AQE-coalesced shuffles, no driver loops."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pg_age_digitaltwins_spark.store.graph_store import GraphStore


def twin_counts_by_model(store: GraphStore) -> DataFrame:
    """Twins per model — `MATCH (t:Twin) RETURN t.model, count(*)`."""
    return store.twins.groupBy("model_id").agg(F.count(F.lit(1)).alias("cnt"))


def rel_counts_by_name(store: GraphStore) -> DataFrame:
    """Edges per relationship name (AGE keeps one table per label; this
    is its catalog-size view)."""
    return store.relationships.groupBy("name").agg(F.count(F.lit(1)).alias("cnt"))


def out_degree(store: GraphStore, name: str | None = None) -> DataFrame:
    """Per-twin outgoing edge count, optionally for one label."""
    rels = store.relationships
    if name is not None:
        rels = rels.filter(F.col("name") == name)
    return rels.groupBy("source_id").agg(F.count(F.lit(1)).alias("out_degree"))


def neighbors_collected(store: GraphStore, name: str) -> DataFrame:
    """Per-target sorted CSV of source twins over one edge label —
    Cypher ``collect(x)`` parity (`GraphInitialization.cs:110-114`)
    made deterministic: ``sort_array(collect_list(..))`` then joined, so
    the result is oracle-hashable.  collect_list is a map-side partial
    aggregate; the sort is per-group, post-shuffle."""
    return (
        store.relationships.filter(F.col("name") == name)
        .groupBy(F.col("target_id").alias("target"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("source_id")), ",").alias(
                "sources"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
