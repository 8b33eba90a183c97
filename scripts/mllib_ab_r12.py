#!/usr/bin/env python
"""Round-12 interleaved A/B for llm_dedup_minhash_mllib (VERDICT r11
#5): approxSimilarityJoin vs the pre-bucketed candidate join over the
SAME fitted MinHashLSH model's hash values.

Asserts (a) the candidate found-sets restricted to the exact set are
identical pair-for-pair, (b) the graded rows are identical, then times
the two full-key forms interleaved A,B,A,B in one session.

Usage: python scripts/mllib_ab_r12.py [rounds]   (default 4)
Artifact: scripts/mllib_ab_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators import llm
from knn_with_mapreduce_cuda_spark.session import get_spark


def old_key(spark, sf_dir):
    """The r11 form, verbatim: approxSimilarityJoin as the pair joiner."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    t = llm._tokens(spark, sf_dir).select("doc_id", "ts").filter(
        col("ts").isNotNull()
    )
    if llm._fixture_rows(sf_dir, "documents") > llm.MINHASH_MLLIB_EXACT_MAX_DOCS:
        bucket = F.substring(F.md5(col("doc_id").cast("string")), 1, 2)
        t = t.filter(bucket < "1a")
    cv = CountVectorizer(inputCol="ts", outputCol="v", binary=True, vocabSize=1 << 18)
    vecs = cv.fit(t).transform(t)
    mh = MinHashLSH(inputCol="v", outputCol="hashes", numHashTables=5, seed=42)
    model = mh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, 0.6, distCol="jdist")
    found = joined.filter(col("datasetA.doc_id") < col("datasetB.doc_id")).select(
        col("datasetA.doc_id").alias("doc_a"),
        col("datasetB.doc_id").alias("doc_b"),
    )
    dt = t.select("doc_id", F.array_distinct("ts").alias("ds"))
    a = dt.select(col("doc_id").alias("doc_a"), F.explode("ds").alias("tok"))
    b = dt.select(col("doc_id").alias("doc_b"), F.explode("ds").alias("tok"))
    inter = (
        a.join(b, "tok")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = dt.select("doc_id", F.size("ds").alias("n"))
    exact = (
        inter.join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("na")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), "doc_b")
        .filter(col("i") * 7 > (col("na") + col("nb")) * 2)
        .select("doc_a", "doc_b")
    )
    n_found = exact.join(found, ["doc_a", "doc_b"], "left_semi").agg(
        F.count("*").alias("found_cnt")
    )
    n_exact = exact.agg(F.count("*").alias("n_exact_pairs"))
    return (
        n_exact.crossJoin(n_found).select(
            "n_exact_pairs",
            (col("found_cnt") * 10 >= col("n_exact_pairs") * 9).alias("recall_ok"),
        ),
        exact.join(found, ["doc_a", "doc_b"], "left_semi"),
    )


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    while os.getloadavg()[0] > 2.0:
        time.sleep(5)
    spark = get_spark("mllib_ab_r12")
    spark.sparkContext.setLogLevel("ERROR")
    tables.table(spark, sf_dir, "documents").count()

    old_df, old_pairs = old_key(spark, sf_dir)
    new_df = llm._q_dedup_minhash_mllib(spark, sf_dir)

    # graded rows identical
    assert sorted(map(tuple, old_df.collect())) == sorted(
        map(tuple, new_df.collect())
    ), "graded rows differ"
    # the found-set restricted to exact (the only way found is graded)
    # is identical pair-for-pair — rebuild the new candidates the same
    # way the new key does, against the same exact set
    new_found_in_exact = None
    # reuse the key's own internals for the pairwise check
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    t = llm._tokens(spark, sf_dir).select("doc_id", "ts").filter(
        col("ts").isNotNull()
    )
    if llm._fixture_rows(sf_dir, "documents") > llm.MINHASH_MLLIB_EXACT_MAX_DOCS:
        bucket = F.substring(F.md5(col("doc_id").cast("string")), 1, 2)
        t = t.filter(bucket < "1a")
    cv = CountVectorizer(inputCol="ts", outputCol="v", binary=True, vocabSize=1 << 18)
    vecs = cv.fit(t).transform(t)
    model = MinHashLSH(
        inputCol="v", outputCol="hashes", numHashTables=5, seed=42
    ).fit(vecs)
    hv = (
        model.transform(vecs)
        .select("doc_id", F.posexplode("hashes").alias("tbl", "hvec"))
        .select("doc_id", "tbl", F.element_at(vector_to_array("hvec"), 1).alias("h"))
        .repartition("tbl", "h")
    )
    cand = (
        hv.select(col("doc_id").alias("doc_a"), "tbl", "h")
        .join(hv.select(col("doc_id").alias("doc_b"), "tbl", "h"), ["tbl", "h"])
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    dt = t.select("doc_id", F.array_distinct("ts").alias("ds"))
    a = dt.select(col("doc_id").alias("doc_a"), F.explode("ds").alias("tok"))
    b = dt.select(col("doc_id").alias("doc_b"), F.explode("ds").alias("tok"))
    inter = (
        a.join(b, "tok")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sizes = dt.select("doc_id", F.size("ds").alias("n"))
    exact = (
        inter.join(sizes.select(col("doc_id").alias("doc_a"), col("n").alias("na")), "doc_a")
        .join(sizes.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), "doc_b")
        .filter(col("i") * 7 > (col("na") + col("nb")) * 2)
        .select("doc_a", "doc_b")
    )
    old_set = sorted(map(tuple, old_pairs.collect()))
    new_set = sorted(
        map(tuple, exact.join(cand, ["doc_a", "doc_b"], "left_semi").collect())
    )
    assert old_set == new_set, (
        f"found∩exact differs: old {len(old_set)} new {len(new_set)}"
    )
    print(f"found∩exact identical: {len(old_set)} pairs", flush=True)

    def run(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run(lambda: old_key(spark, sf_dir)[0])
    run(lambda: llm._q_dedup_minhash_mllib(spark, sf_dir))
    old_runs, new_runs = [], []
    for _ in range(rounds):
        old_runs.append(run(lambda: old_key(spark, sf_dir)[0]))
        new_runs.append(run(lambda: llm._q_dedup_minhash_mllib(spark, sf_dir)))
    out = {
        "sf_dir": sf_dir,
        "n_found_in_exact": len(old_set),
        "old_runs": old_runs,
        "new_runs": new_runs,
        "old_med": round(statistics.median(old_runs), 3),
        "new_med": round(statistics.median(new_runs), 3),
        "identical": True,
    }
    print(
        f"old med {out['old_med']} (runs {old_runs}) / "
        f"new med {out['new_med']} (runs {new_runs})",
        flush=True,
    )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "mllib_ab_r12.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
