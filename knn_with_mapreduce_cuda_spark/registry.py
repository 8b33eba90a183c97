"""Central query registry — merges each operator module's QUERIES/ORACLE.

Every SURVEY.md §2 row ships as one entry in ``queries()`` plus (when
SQL-expressible) one in ``oracle_sql()``. Modules are imported lazily so a
bug in one tier can't take down the whole contract.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: operator modules contributing QUERIES / ORACLE dicts, in tier order.
_MODULES = [
    "knn_with_mapreduce_cuda_spark.operators.knn",
    "knn_with_mapreduce_cuda_spark.operators.relational",
    "knn_with_mapreduce_cuda_spark.operators.llm",
    "knn_with_mapreduce_cuda_spark.operators.streaming_batch",
    "knn_with_mapreduce_cuda_spark.operators.udf",
    "knn_with_mapreduce_cuda_spark.operators.sources_io",
    "knn_with_mapreduce_cuda_spark.operators.iterative",
    "knn_with_mapreduce_cuda_spark.operators.tpch",
    "knn_with_mapreduce_cuda_spark.operators.analytics",
]


def _collect(attr: str) -> dict:
    merged: dict = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ModuleNotFoundError:
            continue
        for key, value in getattr(mod, attr, {}).items():
            if key in merged:
                raise ValueError(f"duplicate query key {key!r} from {mod_name}")
            merged[key] = value
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect("QUERIES")


def oracle_sql() -> dict[str, str]:
    out = _collect("ORACLE")
    known = set(queries())
    stray = set(out) - known
    if stray:
        raise ValueError(f"oracle entries without queries: {sorted(stray)}")
    return out
