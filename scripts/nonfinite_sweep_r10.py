#!/usr/bin/env python
"""Round-10 robustness sweep #2: non-finite numerics.

100 TB of real data contains NaN/Inf: broken encoders emit NaN
embedding components, sensor feeds emit Inf values. NaN is exactly
where engines disagree by convention (ordering: both Spark and DuckDB
sort NaN greatest, but arithmetic/aggregation/round-trip semantics can
drift), and none of the prior fixtures carried a non-finite value.
Fixture:

  - one embedding with a NaN component, one with +Inf, one DBL_MAX
    (overflow on squaring), one subnormal (underflow to 0 on squaring)
  - events.value carrying NaN and +Inf rows
  - lineitem row with DBL_MAX extendedprice (sum overflow → +Inf)

Every registry key must RUN; keys reading events.value or the
embeddings are value-matched against their shipped oracles. Prints
crashes and twin mismatches; findings get fixed + pinned in
tests/test_degenerate_inputs.py.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import duck_connection
from knn_with_mapreduce_cuda_spark.session import get_spark

NAN, INF = float("nan"), float("inf")
DMAX, SUB = 1.7e308, 5e-324
#: NF_SCOPE=closed builds only the CLASSES CLOSED in round 10
#: (NULL/NaN/Inf embedding components, NaN/Inf event values). The
#: default FULL fixture additionally carries the MAGNITUDE classes
#: (DBL_MAX lineitem money, f32-max embedding components), CLOSED in
#: round 11 by the TRY_CAST quantization convention (cents/_CENTS/
#: q_floor/q_ceil in operators/relational.py, the PQ quantizable-domain
#: exclusion in llm._pq_iv, and the per-key conventions recorded in
#: tests/test_degenerate_inputs.py) — the full-fixture sweep must exit
#: 0; any nonzero exit is a regression.
CLOSED_SCOPE = os.environ.get("NF_SCOPE") == "closed"


def build_fixture(out: str) -> None:
    con = duckdb.connect()

    def w(name, sql):
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")

    w("region", "SELECT CAST(0 AS INTEGER) r_regionkey, 'AFRICA' r_name")
    w(
        "nation",
        "SELECT CAST(0 AS INTEGER) n_nationkey, 'ALGERIA' n_name, "
        "CAST(0 AS INTEGER) n_regionkey",
    )
    w(
        "customer",
        "SELECT CAST(1 AS BIGINT) c_custkey, 'Customer#1' c_name, "
        "CAST(0 AS INTEGER) c_nationkey, CAST(100.0 AS DOUBLE) c_acctbal, "
        "'BUILDING' c_mktsegment",
    )
    w(
        "supplier",
        "SELECT CAST(1 AS BIGINT) s_suppkey, 'Supplier#1' s_name, "
        "CAST(0 AS INTEGER) s_nationkey, CAST(100.0 AS DOUBLE) s_acctbal",
    )
    w(
        "part",
        "SELECT CAST(1 AS BIGINT) p_partkey, 'green part' p_name, "
        "'Brand#1' p_brand, 'TYPE A' p_type, CAST(1 AS INTEGER) p_size, "
        "CAST(10.0 AS DOUBLE) p_retailprice",
    )
    w(
        "orders",
        "SELECT CAST(1 AS BIGINT) o_orderkey, CAST(1 AS BIGINT) o_custkey, "
        "'O' o_orderstatus, CAST(10.0 AS DOUBLE) o_totalprice, "
        "TIMESTAMP '1995-01-01 00:00:00' o_orderdate, '1-URGENT' o_orderpriority",
    )
    # DBL_MAX extendedprice: any double SUM over it overflows to +Inf
    con.execute(
        "CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
        "l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.execute(
        "INSERT INTO li VALUES (1,1,1,1,1.0,10.0,0.0,0.0,'N','O',"
        "TIMESTAMP '1995-02-01'), (1,1,1,2,1.0,?,0.0,0.0,'N','O',"
        "TIMESTAMP '1995-02-02')",
        [20.0 if CLOSED_SCOPE else DMAX],
    )
    con.execute(f"COPY (SELECT * FROM li) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 5.0),
        (2, "2024-01-01 10:10:00", 1, "view", NAN),
        (3, "2024-01-01 10:20:00", 1, "purchase", INF),
        (4, "2024-01-01 10:30:00", 2, "view", SUB),
        (5, "2024-01-01 10:40:00", 2, "purchase", 7.0),
    ]
    for r in rows:
        con.execute(
            "INSERT INTO ev VALUES (?, CAST(? AS TIMESTAMP), ?, ?, ?, '{}')", list(r)
        )
    con.execute(f"COPY (SELECT * FROM ev) TO '{out}/events.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    for did in (0, 1, 5, 10):
        con.execute(
            "INSERT INTO docs VALUES (?, 'plain text doc words here', 'en', "
            "'src1', 25)",
            [did],
        )
    con.execute(f"COPY (SELECT * FROM docs) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    vecs = {
        0: [1.0] * 64,
        5: [NAN] + [1.0] * 63,       # NaN component
        7: [INF] + [1.0] * 63,       # Inf component
        50: ([2.0] if CLOSED_SCOPE else [3.0e38]) + [1.0] * 63,  # f32 max-ish
        51: [1e-45] + [1.0] * 63,    # f32 subnormal
    }
    for vid, v in vecs.items():
        con.execute("INSERT INTO emb VALUES (?, ?, ?)", [vid, v, vid % 3])
    con.execute(f"COPY (SELECT * FROM emb) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


def main() -> None:
    """Build the fixture, then run the repo's own DRIVER-STRICT gate
    over it (run_oracle.sweep: canonicalized value-hash compare, the
    same machinery the grading driver replicates) — a hand-rolled repr
    compare false-flags representational differences (DuckDB DECIMAL
    literals vs DOUBLE) that the real gate canonicalizes."""
    out = os.environ.get("NF_FIXTURE") or tempfile.mkdtemp(prefix="nonfinite_sf_")
    build_fixture(out)
    import run_oracle

    spark = get_spark("nonfinite-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"fixture: {out}")
    failures = run_oracle.sweep(spark, out, [])
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
