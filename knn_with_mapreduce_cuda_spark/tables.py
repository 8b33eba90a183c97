"""Canonical table loaders over the driver fixtures (FIXTURES.md).

Parity note (SURVEY.md §1): the reference repo class parses positional
CSV/text records into (id, feature-vector, label); our catalog is the
driver's parquet star schema + events/documents/embeddings, loaded as
DataFrames with canonical casts:

- ``events.ts`` arrives as bigint nanoseconds (nanosAsLong workaround,
  SURVEY.md §7.1) and is converted to a microsecond timestamp with exact
  integer division (``ts div 1000`` — double division would lose precision
  above 2^53 ns).
- ``embeddings.embedding`` (array<float>) is cast to array<double> before
  any arithmetic so results match DuckDB's double math (SURVEY.md §7.2).

Scale design: loaders return lazy DataFrames straight off the parquet
scan — no caching, no collect — so Catalyst can push filters/column
pruning into the scan regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import ensure_runtime_confs

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: per-session memo of loaded tables — ``spark.read.parquet`` re-lists
#: files and re-reads footers on every call, which costs more than the
#: actual work for sub-second queries (measured ~0.5–1.5 s per query at
#: sf0.1, scripts/scale_proof.py). Fixtures are immutable, so reusing
#: the analyzed (lazy) DataFrame is exactly what a metastore-backed
#: catalog does with its schema/file-list cache. Keyed on the session so
#: a restarted SparkSession never sees stale plans.
_TABLE_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with canonical casts applied."""
    key = (id(spark), sf_dir.rstrip("/"), name)
    memo = _TABLE_MEMO.get(key)
    if memo is not None:
        return memo
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts_us is the canonical arithmetic column: DuckDB reads this
        # parquet column at microsecond precision, so all graded time
        # arithmetic happens in µs (floor-truncated from ns) on both sides.
        # Two arrival forms, depending on the Spark build:
        #  - bigint nanos (nanosAsLong honored): exact integer division.
        #  - timestamp_ntz (Spark reads TIMESTAMP(NANOS) natively,
        #    µs-truncated): derive µs via unix_micros under the UTC
        #    session zone set by ensure_runtime_confs.
        if dict(df.dtypes).get("ts") == "bigint":
            df = (
                df.withColumn("ts_ns", F.col("ts"))
                .withColumn("ts_us", F.expr("ts div 1000"))
                .withColumn("ts", F.timestamp_micros(F.expr("ts_us")))
            )
        else:
            us = F.unix_micros(F.col("ts").cast("timestamp"))
            # Sub-µs digits are gone on this path; ts_ns keeps its schema
            # slot (µs-resolution) for API compatibility. Column order
            # matches the bigint path: …, props, ts_ns, ts_us.
            df = (
                df.withColumn("ts_ns", us * F.lit(1000))
                .withColumn("ts_us", us)
                .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            )
    _TABLE_MEMO[key] = df
    return df


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the vector cast to array<double> as ``emb``."""
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
