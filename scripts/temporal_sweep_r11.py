#!/usr/bin/env python
"""Round-11 robustness sweep #3: temporal edges.

100 TB of real event data contains pre-1970 timestamps (mis-parsed
feeds, birthdates in event payloads), epoch-zero sentinels, values at
the int64-nanosecond range limits (1677-09-21 / 2262-04-11 — exactly
where a nanos-carrying pipeline saturates), sub-microsecond precision
that each engine must TRUNCATE THE SAME WAY, and far-past/far-future
dates that cross the 1582 Gregorian reform (where proleptic vs hybrid
calendars diverge). None of the prior fixtures carried any of these;
the events pipeline rides a nanos→µs normalization whose negative-
value semantics were never exercised.

Findings before this script even ran (probing the hazards it targets):
  - Spark ≥4.1.2 native TIMESTAMP(NANOS) reads and DuckDB's nanos
    cast both FLOOR to µs (agree on negatives);
  - the legacy bigint-nanos branch in tables.table used `ts div 1000`
    — truncation toward zero — silently shifting every pre-1970 event
    by 1 µs on legacy builds. Fixed to floor semantics; pinned in
    tests/test_infra.py::test_legacy_bigint_nanos_floor_to_micros.

Finding from this script's FIRST run (the fixture originally put the
int64-nanosecond range limits 1677-09-21 / 2262-04-11 directly into
the main events table): every DENSIFYING hourly-series key — the
ts_* family that gap-fills buckets between min(ts) and max(ts) — then
materializes 5.1 MILLION buckets per key ON BOTH ENGINES, because one
corrupt range-limit timestamp stretches the observed span to 585
years. That is a genuine 100 TB operational hazard (one bad row OOMs
a resample job), now documented in README «Corrupt-data contract»;
the sweep itself therefore runs in two parts:

  1. the FULL registry over a bounded-span fixture (1969-12-31 →
     1970-01-02: negative epoch micros, the -1 ns row, epoch zero,
     sub-µs precision — every nanos semantic, 72 buckets max);
  2. the range-limit mini-fixture (1677/2262/far dates) against the
     NON-DENSIFYING timestamp consumers (RANGE_KEYS below: windows
     over observed rows, as-of/theta joins, date-function renders,
     watermark dedup) — the keys a corrupt range row actually reaches
     without first exploding the bucket axis.

Every key must RUN; value-matching goes through run_oracle.sweep (the
driver-strict comparator).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from knn_with_mapreduce_cuda_spark.session import get_spark


#: non-densifying timestamp consumers probed against the range-limit
#: fixture (part 2): observed-row windows, joins on time predicates,
#: date-function renders, watermark semantics — no bucket axis to
#: explode.
RANGE_KEYS = [
    "rel_fn_date",
    "rel_fn_date2",
    "rel_join_theta_range",
    "rel_join_asof",
    "str_window_tumbling",
    "str_window_sliding",
    "str_window_session",
    "str_dedup_watermark",
    "str_late_data",
    "rel_window_range_interval",
    "rel_dedup_exact",
    "rel_sort_limit",
]


def build_fixture(out: str, range_limits: bool = False) -> None:
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
    # orders: dates across the Gregorian-reform hazard surface
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority VARCHAR)"
    )
    for okey, d in (
        (1, "1500-01-01 00:00:00"),   # pre-reform: proleptic vs hybrid calendars
        (2, "1582-10-04 00:00:00"),   # last Julian day before the reform gap
        (3, "1582-10-15 00:00:00"),   # first Gregorian day
        (4, "9999-12-31 00:00:00"),   # far-future date ceiling
        (5, "1995-01-01 00:00:00"),   # normal anchor
    ):
        con.execute(
            "INSERT INTO o VALUES (?, 1, 'O', 10.0, CAST(? AS TIMESTAMP), "
            "'1-URGENT')",
            [okey, d],
        )
    con.execute(f"COPY (SELECT * FROM o) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
        "l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    for ln, d in (
        (1, "1900-01-01 00:00:00"),
        (2, "2500-06-15 12:00:00"),
        (3, "1995-02-01 00:00:00"),
    ):
        con.execute(
            "INSERT INTO li VALUES (1,1,1,?,1.0,10.0,0.0,0.0,'N','O', "
            "CAST(? AS TIMESTAMP))",
            [ln, d],
        )
    con.execute(f"COPY (SELECT * FROM li) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    # events as TIMESTAMP_NS: the nanos arrival form with negative-epoch
    # and range-limit values, interleaved with a normal 2024 session
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP_NS, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    rows = [
        (1, "1969-12-31 23:59:59.999999999", 1, "view", 5.0),    # -1 ns
        (2, "1969-12-31 23:59:59.000000001", 1, "view", 2.0),    # -1 s + 1 ns
        (3, "1969-12-31 20:17:40", 1, "purchase", 3.0),          # negative epoch
        (4, "1970-01-01 00:00:00", 2, "view", 1.0),              # epoch zero
        (7, "1970-01-02 10:00:00.123456789", 3, "view", 7.0),    # sub-µs precision
        (8, "1970-01-02 10:10:00", 3, "view", 8.0),
        (9, "1970-01-02 10:20:00", 3, "purchase", 9.0),
        (10, "1970-01-02 12:00:00", 3, "click", 1.5),
    ]
    if range_limits:
        rows += [
            (5, "1677-09-21 00:12:44", 2, "view", 4.0),          # ns range floor
            (6, "2262-04-11 23:47:16", 2, "purchase", 6.0),      # ns range ceiling
        ]
    for r in rows:
        con.execute(
            "INSERT INTO ev VALUES (?, CAST(? AS TIMESTAMP_NS), ?, ?, ?, "
            "'{\"k\": 3}')",
            list(r),
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
    con.execute(
        f"COPY (SELECT * FROM docs) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    for vid in (0, 5, 50, 51):
        con.execute(
            "INSERT INTO emb VALUES (?, ?, ?)",
            [vid, [1.0 if (vid + i) % 3 else 0.5 for i in range(64)], vid % 3],
        )
    con.execute(
        f"COPY (SELECT * FROM emb) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()


def main() -> None:
    import run_oracle

    spark = get_spark("temporal-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out = os.environ.get("TS_FIXTURE") or tempfile.mkdtemp(prefix="temporal_sf_")
    build_fixture(out)
    print(f"bounded-span fixture (full registry): {out}")
    failures = run_oracle.sweep(spark, out, [])
    out2 = tempfile.mkdtemp(prefix="temporal_range_sf_")
    build_fixture(out2, range_limits=True)
    print(f"range-limit fixture (RANGE_KEYS): {out2}")
    failures += run_oracle.sweep(spark, out2, RANGE_KEYS)
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
