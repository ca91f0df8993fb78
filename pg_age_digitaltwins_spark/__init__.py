"""PySpark-native digital-twin analytics engine.

A from-scratch re-expression of the capabilities of
konnektr-io/pg-age-digitaltwins (C# on Postgres + Apache AGE) on top of
Apache Spark:

* a **graph store** — twins / relationships / models as DataFrames over
  Parquet (SURVEY.md §1.4 schemas),
* an **ADT Query Language compiler** — real tokenizer/parser/AST →
  DataFrame plans (the reference translates ADT QL to Cypher strings with
  regexes, ``src/AgeDigitalTwins/AdtQueryHelpers.cs``; we compile to
  Catalyst plans instead),
* **change-event streaming** (Structured Streaming standing in for
  Postgres logical replication → CloudEvents),
* **large-scale data-pipeline operators** (dedup, similarity search,
  text analysis) beyond the reference surface.

Everything is built on the public PySpark DataFrame API; no code is
copied from the reference.
"""

from pg_age_digitaltwins_spark.session import get_spark
from pg_age_digitaltwins_spark.store.graph_store import GraphStore
from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient

__all__ = ["get_spark", "GraphStore", "DigitalTwinsSparkClient"]
__version__ = "0.1.0"
