"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end KG construction (extract ->
  skolemize -> link -> canonicalize -> dedup) over the deterministic
  conformance-fixture pages corpus.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  the training-data operator families).
- ``oracle_sql()``: exact DuckDB equivalents (omitted only for ops
  built on Spark-native hashing or Python UDF stages, which the driver
  records as rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from microdata_rdf_streaming_parser_js_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline over the synthesized pages corpus."""
    from microdata_rdf_streaming_parser_js_spark.plans.pipeline import build_triples
    from microdata_rdf_streaming_parser_js_spark.sources.pages import (
        synthesize_fixture_pages,
    )

    pages = synthesize_fixture_pages(spark, n_pages=500, n_hosts=20)
    return build_triples(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {name: build() for name, build in ORACLES.items()}
