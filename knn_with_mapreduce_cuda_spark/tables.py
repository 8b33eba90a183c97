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

import weakref

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

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


class SessionMemo:
    """Per-session memo of analyzed lazy DataFrames — ``spark.read.parquet``
    re-lists files and re-reads footers on every call, which costs more
    than the actual work for sub-second queries (measured ~0.5–1.5 s per
    query at sf0.1, scripts/scale_proof.py); reusing the analyzed plan is
    what a metastore-backed catalog's schema/file-list cache does.

    Entries pair the value with a *weak* session reference (ADVICE r02):
    a hit is served only while the weakref still resolves to the same
    live, *running* session, so a garbage-collected session (or a
    reused ``id()``) can never serve a stale plan. Because a memoized
    DataFrame itself holds a strong reference to its session, the
    weakref alone would never die while the entry exists — so the purge
    in ``put`` additionally evicts entries whose session has been
    **stopped** (``_stopped``), which is what actually releases stopped
    sessions in a long-lived process. ``invalidate(sf_dir)`` drops
    entries for a directory about to be rewritten in-session (e.g.
    scripts/scale_proof.py's scratch)."""

    _ALL: list["SessionMemo"] = []

    def __init__(self) -> None:
        self._m: dict[tuple, tuple[weakref.ref, object]] = {}
        SessionMemo._ALL.append(self)

    @staticmethod
    def _stopped(spark) -> bool:
        sc = getattr(spark, "sparkContext", None)
        if sc is None:  # owner without a context — nothing to probe
            return False
        try:
            return sc._jsc.sc().isStopped()
        except Exception:  # torn-down context — treat as stopped
            return True

    def get(self, spark: SparkSession, key: tuple):
        hit = self._m.get((id(spark), *key))
        if hit is not None and hit[0]() is spark and not self._stopped(spark):
            return hit[1]
        return None

    def put(self, spark: SparkSession, key: tuple, value) -> None:
        dead = [
            k
            for k, (ref, _) in self._m.items()
            if ref() is None or self._stopped(ref())
        ]
        for k in dead:
            del self._m[k]
        self._m[(id(spark), *key)] = (weakref.ref(spark), value)

    def invalidate(self, sf_dir: str) -> None:
        stem = sf_dir.rstrip("/")
        gone = [k for k in self._m if len(k) > 1 and k[1] == stem]
        for k in gone:
            del self._m[k]


def invalidate_caches(sf_dir: str) -> None:
    """Drop every memoized plan touching ``sf_dir`` (call before
    rewriting a directory that was already read in this session)."""
    for memo in SessionMemo._ALL:
        memo.invalidate(sf_dir)


def local_file(uri: str) -> str | None:
    """``file:``-URI → local filesystem path, or None when the URI does
    not resolve to a local file (remote store, directory, missing)."""
    import os

    path = uri[5:] if uri.startswith("file:") else uri
    return path if os.path.isfile(path) else None


def parquet_rows(path: str) -> int:
    """Exact row count from parquet footer metadata of a single file or
    a Spark-written part directory — driver-side file reads, no Spark
    job. The shared primitive behind llm._fixture_rows and
    plans.gemm_knn._rows_upper_bound."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{path.rstrip('/')}/*.parquet")
    )


_TABLE_MEMO = SessionMemo()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with canonical casts applied."""
    key = (sf_dir.rstrip("/"), name)
    memo = _TABLE_MEMO.get(spark, key)
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
            # FLOOR division, not `div`: Spark's `div` truncates toward
            # zero, so a pre-1970 nanosecond (-999_999_999 ns) would map
            # to -999_999 µs where the native ≥4.1.2 read path, DuckDB's
            # nanos cast, AND IEEE floor all say -1_000_000 — a silent
            # 1 µs divergence on every negative-epoch event under the
            # legacy arrival form (r11 temporal sweep). The adjustment
            # term is exact integer arithmetic (Spark % follows the
            # dividend's sign).
            df = (
                df.withColumn("ts_ns", F.col("ts"))
                .withColumn(
                    "ts_us",
                    F.expr(
                        "(ts div 1000) + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)"
                    ),
                )
                .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
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
        # Non-finite measurements are MISSING DATA at ingest (r10
        # non-finite sweep, scripts/nonfinite_sweep_r10.py): a NaN/Inf
        # `value` crashes every downstream ANSI quantization
        # (CAST_OVERFLOW) while DuckDB errors on CAST(NaN AS BIGINT) —
        # both engines' loaders (here and oracle.duck_connection's
        # events view) map them to NULL, the same canonicalization
        # layer that already owns the ts normalization above. Identity
        # on finite values: graded outputs unchanged.
        df = df.withColumn(
            "value",
            F.when(
                F.isnan("value") | (F.abs(F.col("value")) == F.lit(float("inf"))),
                F.lit(None).cast("double"),
            ).otherwise(F.col("value")),
        )
    _TABLE_MEMO.put(spark, key, df)
    return df


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with the vector cast to array<double> as ``emb``.

    A vector carrying a NULL or NON-FINITE component is poisoned to a
    NULL vector —
    the engine-wide corrupt-vector convention (README §Corrupt-data
    contract; r10 non-finite sweep,
    scripts/nonfinite_sweep_r10.py): a partially-missing embedding is
    exactly as unusable as a missing one, every fold-based metric then
    yields the NULL distance the oracles expect (DuckDB list_distance
    ERRORS on NULL elements and its list folds silently SKIP them —
    both wrong), and the GEMM/stored-index kernels' existing
    NULL-vector exclusion (r09) covers it with no new code path.
    Identity on fully-non-NULL vectors, so graded outputs and golden
    digests are unchanged."""
    poisoned = F.when(
        _corrupt_vector("embedding"),
        F.lit(None),
    ).otherwise(F.col("embedding").cast("array<double>"))
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", poisoned.alias("emb"), "label"
    )


def _corrupt_vector(c) -> Column:
    """True when the vector carries a NULL or non-finite component —
    the shared poison predicate of embeddings() / embeddings_valid()."""
    return F.exists(
        c,
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )


def embeddings_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like embeddings(), but poisoned vectors are FILTERED instead of
    NULLed, so ``emb`` is non-nullable BY CONSTRUCTION (the raw parquet
    column is required; no CASE ever materializes a NULL array).

    Consumers that hand ``emb`` to a null-intolerant kernel need this
    stronger shape: Catalyst's subexpression elimination may evaluate a
    UDF inside a predicate BEFORE the isNotNull conjunct of the same
    stage (r11 non-finite sweep: MLlib's array_to_vector NPE'd on a
    poisoned row that a .filter(emb.isNotNull()) had 'already' removed
    — the filter and the UDF shared one codegen stage and the UDF ran
    first). Identical surviving-row set to
    embeddings().filter(emb.isNotNull())."""
    raw = table(spark, sf_dir, "embeddings")
    return raw.filter(~_corrupt_vector("embedding")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
