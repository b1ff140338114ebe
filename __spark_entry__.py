"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):    flagship RELAXED sanitize + content extraction over the
                 interleaved-span corpus built from sf0.001 testdata.
queries():       one callable per implemented operator (SURVEY.md §2).
oracle_sql():    DuckDB-equivalent SQL for every SQL-expressible query;
                 column aliases match the Spark plans exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selma_spark.spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build interleaved-span
    documents, sanitize (RELAXED) + strip boilerplate via the vectorized
    rewrite pipeline, return (doc_id, n_spans, out_chars)."""
    return _q.q_extract_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.build_queries()


def oracle_sql() -> dict[str, str]:
    return _q.build_oracles()
