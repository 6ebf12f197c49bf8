"""SPARQL front-end: parser for the reference's supported fragment and the
compiler that lowers it to Spark DataFrame plans."""

from kolibrie_spark.sparql.parser import parse_query
from kolibrie_spark.sparql.compiler import Compiler

__all__ = ["parse_query", "Compiler"]
