"""Source/sink graded queries — prove the connector layer round-trips
exactly (SURVEY.md §1.1 source formats; writers in sources/readers.py).

Each query writes a fixture out through a connector, reads it back, and
aggregates; the oracle computes the same aggregate straight from the
original parquet — any loss in the round-trip (schema drift, float
formatting, header handling) breaks the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from .. import tables
from ..sources import readers
from .relational import cents, _sum_cents_sql
from .streaming_batch import SCRATCH


def _q_csv_roundtrip(spark, sf_dir):
    cust = tables.table(spark, sf_dir, "customer")
    path = os.path.join(SCRATCH, "csv_customer")
    readers.write_csv(cust, path)
    back = readers.read_csv(
        spark,
        path,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(col("c_acctbal"))).alias("bal_cents"),
        F.min("c_name").alias("first_name"),
    )


def _q_jsonl_roundtrip(spark, sf_dir):
    orders = tables.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(SCRATCH, "jsonl_orders")
    readers.write_jsonl(orders, path)
    back = readers.read_jsonl(
        spark,
        path,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(col("o_totalprice"))).alias("price_cents"),
    )


def _q_knn_text_roundtrip(spark, sf_dir):
    """Reference-format train file (label,f1,…,f64) written then re-parsed
    (SURVEY.md §1.1): Java Double.toString round-trips doubles exactly, so
    per-label min/max of the first coordinate must equal the parquet
    originals."""
    e = tables.embeddings(spark, sf_dir)
    # the reference text format cannot represent a NULL label or vector
    # (concat_ws silently SKIPS nulls, shifting every field left — the
    # reader then parses an embedding value as the label and crashes;
    # r09 null-injection sweep). Unrepresentable rows are excluded on
    # write; the oracle carries the same predicate.
    lines = e.filter(col("label").isNotNull() & col("emb").isNotNull()).select(
        F.concat_ws(
            ",", col("label").cast("string"), F.concat_ws(",", col("emb").cast("array<string>"))
        ).alias("value")
    )
    path = os.path.join(SCRATCH, "knn_text")
    lines.coalesce(1).write.mode("overwrite").text(path)
    back = readers.read_knn_text(spark, path, dim=64)
    return back.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.round(F.min(F.element_at("emb", 1)), 4).alias("min_f1"),
        F.round(F.max(F.element_at("emb", 1)), 4).alias("max_f1"),
        F.min(F.size("emb")).cast("long").alias("dim"),
    )


def _q_orc_roundtrip(spark, sf_dir):
    """ORC — the second Spark-native columnar format (same pushdown and
    pruning machinery as parquet). Timestamps go through ORC natively."""
    li = tables.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    path = os.path.join(SCRATCH, "orc_lineitem")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(cents(col("l_extendedprice"))).alias("price_cents"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


def _q_python_datasource(spark, sf_dir):
    """The Spark 4 custom Python DataSource end-to-end: embeddings dumped
    to the reference's text format, read back through
    ``spark.read.format("knn_text")`` with an EqualTo(label) predicate
    pushed INTO the source (non-matching lines never cross the
    Python→JVM boundary). Grading aggregate matches the parquet
    originals for that label."""
    from ..sources import knn_datasource

    e = tables.embeddings(spark, sf_dir)
    # null label/vector rows are unrepresentable in the line format —
    # see _q_knn_text_roundtrip (r09 null-injection sweep)
    lines = (
        e.filter(col("label").isNotNull() & col("emb").isNotNull())
        .orderBy("vec_id")
        .select(
            F.concat_ws(
                ",",
                col("label").cast("string"),
                F.concat_ws(",", col("emb").cast("array<string>")),
            ).alias("value")
        )
    )
    path = os.path.join(SCRATCH, "knn_ds_text")
    lines.coalesce(1).write.mode("overwrite").text(path)
    knn_datasource.register(spark)
    back = (
        spark.read.format("knn_text")
        .option("dim", "64")
        .load(path)
        .filter(col("label") == 3)
    )
    return back.groupBy("label").agg(
        F.count("*").alias("cnt"),
        F.round(F.min(F.element_at("emb", 1)), 4).alias("min_f1"),
        F.round(F.max(F.element_at("emb", 1)), 4).alias("max_f1"),
        F.min(F.size("emb")).cast("long").alias("dim"),
    )


def _q_partition_prune_read(spark, sf_dir):
    """Hive-style partitioned layout end-to-end: write documents
    partitioned by lang, read back with a partition predicate. The filter
    never touches non-en files — partition pruning happens at planning
    time (asserted in tests/test_plans.py for the same layout). This is
    THE layout decision for a 100 TB corpus store: partition by coarse
    selective keys (lang, date), so per-slice jobs scan only their
    slice."""
    docs = tables.table(spark, sf_dir, "documents")
    path = os.path.join(SCRATCH, "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(col("lang") == "en")
    return back.groupBy("source").agg(
        F.count("*").alias("cnt"),
        F.min("doc_id").alias("min_doc"),
        F.sum("n_chars").cast("long").alias("chars"),
    )


def _q_parquet_metadata(spark, sf_dir):
    """Storage introspection: per-row-group footer statistics of the
    fact table (row counts, column-chunk count, exact compressed bytes)
    read distributed — one task per file via mapInPandas over the file
    list, footers only, zero data pages touched. The scan-planning
    telemetry a 100 TB table needs before choosing split sizes; oracle:
    DuckDB's parquet_metadata() over the same footer. The oracle path is
    pinned to the graded sf0.01 fixture (the driver's t2 runs oracle SQL
    verbatim with no path templating), so this key is only
    oracle-comparable at sf0.01 — skip it in other-SF sweeps."""
    import pandas as pd

    files = sorted(
        os.path.join(sf_dir, "lineitem.parquet", f)
        if os.path.isdir(os.path.join(sf_dir, "lineitem.parquet"))
        else os.path.join(sf_dir, "lineitem.parquet")
        for f in (
            os.listdir(os.path.join(sf_dir, "lineitem.parquet"))
            if os.path.isdir(os.path.join(sf_dir, "lineitem.parquet"))
            else [""]
        )
        if f.endswith(".parquet") or f == ""
    )
    fdf = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        len(files)
    )

    def footer(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    out.append(
                        {
                            "file_name": os.path.basename(p),
                            "row_group_id": rg,
                            "num_rows": g.num_rows,
                            "n_cols": g.num_columns,
                            "compressed_bytes": sum(
                                g.column(i).total_compressed_size
                                for i in range(g.num_columns)
                            ),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_name",
                    "row_group_id",
                    "num_rows",
                    "n_cols",
                    "compressed_bytes",
                ],
            )

    return fdf.mapInPandas(
        footer,
        "file_name string, row_group_id long, num_rows long, n_cols long,"
        " compressed_bytes long",
    )


QUERIES = {
    "src_parquet_metadata": _q_parquet_metadata,
    "src_csv_roundtrip": _q_csv_roundtrip,
    "src_jsonl_roundtrip": _q_jsonl_roundtrip,
    "src_knn_text_roundtrip": _q_knn_text_roundtrip,
    "src_orc_roundtrip": _q_orc_roundtrip,
    "src_partition_prune_read": _q_partition_prune_read,
    "src_python_datasource": _q_python_datasource,
}

ORACLE = {
    "src_parquet_metadata": (
        # grouped by (file, row_group) so a multi-file layout stays
        # correct (ADVICE r01); the {SF_DIR} placeholder is rendered by
        # registry.oracle_sql(sf_dir=...) — the driver gets the graded
        # sf0.01 path verbatim, while run_oracle.py re-renders per SF so
        # the key sweeps cleanly at every fixture scale (VERDICT r02 #4).
        "SELECT parse_filename(file_name) AS file_name, row_group_id, "
        "row_group_num_rows AS num_rows, count(*) AS n_cols, "
        "CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes "
        "FROM parquet_metadata('{SF_DIR}/lineitem.parquet') "
        "GROUP BY parse_filename(file_name), row_group_id, row_group_num_rows"
    ),
    "src_csv_roundtrip": (
        "SELECT c_mktsegment, count(*) AS cnt, "
        + _sum_cents_sql("c_acctbal")
        + " AS bal_cents, min(c_name) AS first_name FROM customer GROUP BY c_mktsegment"
    ),
    "src_jsonl_roundtrip": (
        "SELECT o_orderstatus, count(*) AS cnt, "
        + _sum_cents_sql("o_totalprice")
        + " AS price_cents FROM orders GROUP BY o_orderstatus"
    ),
    "src_knn_text_roundtrip": (
        # label/embedding IS NOT NULL + the poison predicate mirror the
        # writer: NULL and poisoned (non-finite-component) vectors are
        # unrepresentable in the reference line format (r09/r11 sweeps)
        "WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings "
        "WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0) "
        "SELECT label, count(*) AS cnt, round(min(emb[1]), 4) AS min_f1, "
        "round(max(emb[1]), 4) AS max_f1, CAST(min(len(emb)) AS BIGINT) AS dim "
        "FROM emb GROUP BY label"
    ),
    "src_orc_roundtrip": (
        "SELECT l_returnflag, count(*) AS cnt, "
        + _sum_cents_sql("l_extendedprice")
        + " AS price_cents, round(sum(l_quantity), 4) AS qty, "
        "strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "src_partition_prune_read": (
        "SELECT source, count(*) AS cnt, min(doc_id) AS min_doc, "
        "CAST(sum(n_chars) AS BIGINT) AS chars "
        "FROM documents WHERE lang = 'en' GROUP BY source"
    ),
    "src_python_datasource": (
        # embedding IS NOT NULL mirrors the writer (label = 3 already
        # excludes null labels); see src_knn_text_roundtrip
        "WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS emb, label "
        "FROM embeddings WHERE label = 3 AND embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0) "
        "SELECT label, count(*) AS cnt, round(min(emb[1]), 4) AS min_f1, "
        "round(max(emb[1]), 4) AS max_f1, CAST(min(len(emb)) AS BIGINT) AS dim "
        "FROM emb GROUP BY label"
    ),
}
