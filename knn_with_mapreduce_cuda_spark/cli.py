"""CLI — the reference's entry-point parity (SURVEY.md §3.1).

The reference repo class is invoked as ``hadoop jar knn.jar KNNDriver
<train> <test> <k> <out>`` (Entry A) or ``./knn <train.csv> <test.csv>
<k>`` (Entry B). The Spark-native equivalents:

    python -m knn_with_mapreduce_cuda_spark.cli classify \
        --sf-dir /root/testdata/sf0.001 -k 10 [--strategy gemm] [--out DIR]

    python -m knn_with_mapreduce_cuda_spark.cli classify-files \
        --train train.csv --test test.csv --dim 64 -k 10 [--out DIR]

``--out`` writes ``testId<TAB>predictedLabel`` text part-files — the
MapReduce TextOutputFormat contract (A.8). ``--strategy gemm`` selects the
blockwise GEMM physical path (the CUDA-kernel analog); ``expr`` the pure
Catalyst expression path. Both produce identical predictions (tested).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.functions import col


def _classify_frames(q, t, k: int, strategy: str):
    from .operators import knn
    from .plans.gemm_knn import knn_topk_gemm

    if strategy == "gemm":
        top = knn_topk_gemm(q.select("qid", "qemb"), t.select("tid", "temb"), k)
        # broadcast-hint the label dims so the candidate relation stays
        # streamed and the vote tail reuses its hash(qid) partitioning
        # (one exchange total — see bench.knn_classify_gemm / SCALE.md 9a)
        labeled = top.join(F.broadcast(t.select("tid", "tlabel")), "tid").join(
            F.broadcast(q.select("qid", "qlabel")), "qid"
        )
        return knn.majority_vote(labeled)
    return knn.majority_vote(knn.topk(knn.with_distance(knn.all_pairs(q, t)), k))


def cmd_classify(args) -> int:
    from . import tables
    from .operators import knn
    from .session import get_spark

    spark = get_spark("knn-cli")
    spark.sparkContext.setLogLevel("ERROR")
    e = tables.embeddings(spark, args.sf_dir)
    t0 = time.perf_counter()
    pred = _classify_frames(knn.split_test(e), knn.train_all(e), args.k, args.strategy)
    pred = pred.cache()
    n = pred.count()
    acc = pred.agg(F.avg(col("correct").cast("double"))).collect()[0][0]
    elapsed = time.perf_counter() - t0
    if args.out:
        from .sources.readers import write_predictions_text

        write_predictions_text(pred, args.out)
    print(f"classified {n} queries  k={args.k}  strategy={args.strategy}")
    print(f"accuracy {acc:.4f}  wall {elapsed:.2f}s")
    return 0


def cmd_classify_files(args) -> int:
    from .operators import knn
    from .session import get_spark
    from .sources.readers import read_knn_text, write_predictions_text

    spark = get_spark("knn-cli")
    spark.sparkContext.setLogLevel("ERROR")
    train = read_knn_text(spark, args.train, args.dim)
    test = read_knn_text(spark, args.test, args.dim)
    q = test.select(
        col("vec_id").alias("qid"), col("emb").alias("qemb"), col("label").alias("qlabel")
    )
    t = train.select(
        col("vec_id").alias("tid"), col("emb").alias("temb"), col("label").alias("tlabel")
    )
    pred = _classify_frames(q, t, args.k, args.strategy).cache()
    n = pred.count()
    acc = pred.agg(F.avg(col("correct").cast("double"))).collect()[0][0]
    if args.out:
        write_predictions_text(pred, args.out)
    print(f"classified {n} queries  k={args.k}  accuracy {acc:.4f}")
    return 0


def cmd_sql(args) -> int:
    """Ad-hoc SQL over the fixture catalog — the engine's third entry
    point (SURVEY.md §3.2): every fixture registered as a temp view, the
    statement run through the same Catalyst pipeline as the DataFrame
    queries."""
    from . import tables
    from .session import get_spark

    spark = get_spark("knn-cli")
    spark.sparkContext.setLogLevel("ERROR")
    tables.register_views(spark, args.sf_dir)
    df = spark.sql(args.query)
    rows = df.limit(args.limit).collect()
    print("\t".join(df.columns))
    for r in rows:
        print("\t".join(str(v) for v in r))
    print(f"-- {len(rows)} row(s) shown (limit {args.limit})")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="knn_with_mapreduce_cuda_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("classify", help="kNN classify the fixture embeddings")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("-k", type=int, default=10)
    c.add_argument("--strategy", choices=["expr", "gemm"], default="gemm")
    c.add_argument("--out", default=None, help="write testId\\tpred text part-files here")
    c.set_defaults(fn=cmd_classify)

    f = sub.add_parser("classify-files", help="reference CLI shape: train/test CSV files")
    f.add_argument("--train", required=True)
    f.add_argument("--test", required=True)
    f.add_argument("--dim", type=int, default=64)
    f.add_argument("-k", type=int, default=10)
    f.add_argument("--strategy", choices=["expr", "gemm"], default="gemm")
    f.add_argument("--out", default=None)
    f.set_defaults(fn=cmd_classify_files)

    s = sub.add_parser("sql", help="run SQL over the fixture tables")
    s.add_argument("query")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_sql)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
