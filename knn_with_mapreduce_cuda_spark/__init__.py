"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``hb5813/KNN_with_MapReduce-CUDA`` repo class, rebuilt
Spark-first (DataFrame/SQL + Catalyst), per SURVEY.md.

Public surface:
- ``session.get_spark()`` — canonical SparkSession.
- ``tables`` — fixture loaders with canonical casts.
- ``registry.queries()`` / ``registry.oracle_sql()`` — the graded
  SURVEY.md §2 inventory.
- ``operators.knn`` — kNN classify/join/top-k (the reference's core).
- ``plans.gemm_knn`` — blockwise NumPy GEMM kNN (the CUDA-kernel analog).
"""

from . import session, tables  # noqa: F401

__version__ = "0.1.0"
