"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``knn_with_mapreduce_cuda_spark/`` — the
operator inventory is SURVEY.md §2; each operators/ module contributes
its QUERIES/ORACLE pairs via the central registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knn_with_mapreduce_cuda_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: kNN classification over sf0.001 embeddings (SURVEY §7.3)."""
    from knn_with_mapreduce_cuda_spark.operators.knn import classify

    return classify(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
