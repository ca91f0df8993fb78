from pg_age_digitaltwins_spark.cypher.parser import parse_cypher
from pg_age_digitaltwins_spark.cypher.compiler import compile_cypher

__all__ = ["parse_cypher", "compile_cypher"]
