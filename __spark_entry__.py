"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship near-dup clustering over sf0.001 documents.
queries()/oracle_sql(): operator inventory from SURVEY.md §2 as
Spark-vs-DuckDB parity pairs (see ufuzzy_spark/entry_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline (MinHash/LSH/verify/CC) over
    the sf0.001 documents table mapped to the page schema."""
    from ufuzzy_spark.pipeline import run_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.format_string("%07d", "doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    res = run_pipeline(spark, pages)
    return res.clusters


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ufuzzy_spark import entry_queries

    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    from ufuzzy_spark import entry_queries

    return entry_queries.oracle_sql()
