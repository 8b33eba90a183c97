"""Source connectors + CLI entry-point parity (SURVEY.md §3.1)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.cli import _classify_frames
from knn_with_mapreduce_cuda_spark.operators import knn
from knn_with_mapreduce_cuda_spark.sources import readers
from tests.conftest import SF_SMOKE


def _write_ref_csv(spark, df, path):
    lines = df.select(
        F.concat_ws(
            ",", col("label").cast("string"), F.concat_ws(",", col("emb").cast("array<string>"))
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(path)


def test_knn_text_reader_roundtrip(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    d = tempfile.mkdtemp(prefix="knncsv_")
    _write_ref_csv(spark, e, os.path.join(d, "train"))
    back = readers.read_knn_text(spark, os.path.join(d, "train"), 64)
    assert back.count() == e.count()
    # doubles round-trip exactly through Double.toString
    orig = sorted(r[0] for r in e.select(F.element_at("emb", 1)).collect())
    got = sorted(r[0] for r in back.select(F.element_at("emb", 1)).collect())
    assert orig == got
    assert back.select(F.min(F.size("emb"))).collect()[0][0] == 64


def test_gemm_and_expr_strategies_agree(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    q, t = knn.split_test(e), knn.train_all(e)
    a = _classify_frames(q, t, 10, "gemm").select("qid", "pred_label").toPandas()
    b = _classify_frames(q, t, 10, "expr").select("qid", "pred_label").toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(a) == key(b)


def test_predictions_text_format(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    pred = _classify_frames(knn.split_test(e), knn.train_all(e), 10, "expr")
    d = tempfile.mkdtemp(prefix="preds_")
    readers.write_predictions_text(pred, d)
    lines = spark.read.text(d).collect()
    assert len(lines) == pred.count()
    qid, label = lines[0][0].split("\t")
    assert qid.isdigit() and label.lstrip("-").isdigit()


def test_bucketed_table_join_has_no_shuffle(spark):
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    shutil.rmtree("spark-warehouse/orders_bucketed", ignore_errors=True)
    e = tables.table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    readers.write_bucketed_table(e, "orders_bucketed", "o_orderkey", 8)
    t = spark.table("orders_bucketed")
    # force SMJ (broadcast would win on this tiny fixture): bucketed scans
    # are pre-partitioned on the key, so the merge join needs no shuffle
    joined = t.alias("a").hint("merge").join(
        spark.table("orders_bucketed").alias("b"), "o_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_cli_sql_subcommand(capsys):
    from knn_with_mapreduce_cuda_spark.cli import main

    rc = main(
        [
            "sql",
            "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
            "--sf-dir",
            SF_SMOKE,
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "r_name" in out and "row(s) shown" in out
