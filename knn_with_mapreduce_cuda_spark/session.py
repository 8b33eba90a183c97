"""SparkSession factory with the engine's canonical configuration.

Parity note (SURVEY.md §3.1): the reference repo class configures its
runtime via Hadoop ``JobConf`` / CUDA launch parameters; our equivalent is
one SparkSession with UTC session time, AQE on, and the legacy
nanos-as-long parquet flag required by the ``events`` fixture
(SURVEY.md §7.1 hazard).

Scale design: nothing here assumes local mode. ``SPARK_MASTER`` /
``SPARK_GRAFT_CPUS`` env vars select the cluster; shuffle partitions
default to 32 locally but should be ~2-3x total cores on a real cluster
(or left to AQE coalescing, which is enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are runtime-settable and required for correctness no matter
#: who built the session (the grading driver builds its own).
RUNTIME_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS); older Spark 4 builds
    # refuse it unless this legacy flag maps it to bigint nanoseconds
    # (SURVEY.md §7.1). Spark ≥4.1.2 reads nanos natively (µs-truncated
    # timestamp_ntz) and ignores the flag — tables.table() handles both
    # arrival forms.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics for timestamp functions so the
    # DuckDB oracle (naive timestamps) and Spark agree.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs to an externally built session.

    Called from every table loader so the engine works inside the grading
    driver's own SparkSession, not just ours.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf locked by the host session: proceed; reads that need it
            # will raise a clear error of their own.
            pass
    return spark


def cluster_confs(total_cores: int = 4000) -> dict[str, str]:
    """The documented 100 TB deploy profile — SCALE.md §0's knob set as
    code, so the sizing arithmetic there and the session builder here
    can't drift (VERDICT r08 #7). ``total_cores`` is the cluster's task
    slots (the §0 model: 1000 executors × 4 cores = 4000).

    - input splits: 128 MiB ⇒ ~800 k scan tasks over 100 TB;
    - shuffle partitions: a CEILING of 3× total cores (12 k at the
      model shape — within §0's "~2–3× total cores, 8–12 k" band) with
      AQE coalescing shrinking small stages back down;
    - AQE on (coalesce + skew-join split);
    - broadcast ceiling: the 10 MB default — every intentional
      broadcast in this engine is an explicit F.broadcast of a side
      the operator can bound.

    Local runs keep get_spark()'s 32-partition default; on a real
    cluster apply this dict on top (spark-submit --conf or
    builder.config loops) plus RUNTIME_CONFS, which it includes."""
    confs = {
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.sql.shuffle.partitions": str(3 * total_cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # one BLAS thread per task slot (see get_spark: the GEMM
        # kernels parallelize at the partition level; threaded BLAS
        # inside each worker oversubscribes the executor)
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1",
    }
    confs.update(RUNTIME_CONFS)
    return confs


def get_spark(app_name: str = "knn-mapreduce-cuda-spark") -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    local[{SPARK_GRAFT_CPUS}] by default; on a real cluster pass
    SPARK_MASTER. AQE handles skew-join splitting and post-shuffle
    coalescing at scale (SURVEY.md §4).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")

    def _default_driver_mem() -> str:
        """Heap scaled to task slots — ~0.75 GB per concurrent task,
        floor 8g (guide §5: memory per executor follows its cores; in
        local mode the driver IS the executor, so a fixed 8g that was
        right for 8 slots is under-provisioned at 32). Measured (r12
        GC-spike forensics, scripts/gcspike_r12_*.json): at 8g/32 slots
        the post-suite matching samples were BISTABLE — the same
        protocol read 0.9 s in one session and degraded to 4-10 s
        (wall AND process-tree CPU together) in another, tracking the
        heap occupancy trajectory; at 24g both with- and without-GC
        protocols read 0.80-0.94 s with no spikes. This is the r11
        driver-environment headline blowout (VERDICT r11 #2): its
        knn_classify_full regated median of 9.968 s at 32 cores was
        this bistability, not engine plan cost. SPARK_DRIVER_MEMORY
        still overrides."""
        try:
            n = int(cpus)
        except ValueError:
            n = os.cpu_count() or 8
        return f"{max(8, (n * 3) // 4)}g"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        # Single-threaded BLAS inside python workers: the GEMM kernels
        # (plans/gemm_knn.py) parallelize at the PARTITION level — N
        # concurrent workers × OpenBLAS's default ncpu threads each is
        # N× oversubscription, measured here as intermittent 5-7 s
        # spin-storms on the sf0.1 GEMM rows (r11 bench forensics;
        # single-threaded workers cut the worst case to ~2 s with the
        # same fast-path throughput). On a real cluster this is the
        # standard task-parallel BLAS configuration: one BLAS thread
        # per task slot.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
