from pg_age_digitaltwins_spark.adtql.parser import parse
from pg_age_digitaltwins_spark.adtql.compiler import compile_query

__all__ = ["parse", "compile_query"]
