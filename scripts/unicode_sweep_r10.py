#!/usr/bin/env python
"""Round-10 robustness sweep: Unicode-degenerate text inputs.

The r09 degenerate sweep covered structural edge cases (empty docs,
zero-norm vectors, constant series). This sweep probes the TEXT layer's
other failure class: Unicode semantics. Spark and DuckDB both claim
UTF-8 strings, but length()/substring()/regexp semantics (bytes vs
codepoints vs grapheme clusters), case folding, and \\w / \\s classes
are exactly where two engines quietly disagree. Fixture documents:

  - CJK with NO spaces (tokenizers that split on whitespace see 1 token)
  - emoji incl. ZWJ sequences + skin-tone modifiers (multi-codepoint
    graphemes)
  - combining diacritics (e + U+0301, NFD) vs precomposed (NFC)
  - RTL Arabic with tashkeel marks
  - NBSP / tab / newline whitespace variants
  - a 4-byte supplementary-plane char (surrogate-pair hazard in
    UTF-16-based engines)
  - mixed-script token

Every registry key must RUN; text-family keys are additionally
value-matched against their shipped oracle SQL. Prints crashes and
twin mismatches; findings get fixed + pinned in
tests/test_degenerate_inputs.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import duck_connection
from knn_with_mapreduce_cuda_spark.session import get_spark

DOCS = [
    (0, "日本語のテキストです。分かち書きなし"),  # Japanese, no spaces
    (1, "café café CAFÉ"),  # NFC vs NFD vs upper+combining
    (2, "\U0001f469‍\U0001f4bb works \U0001f44d\U0001f3fd ok \U0001f680"),  # ZWJ + modifier
    (3, "مَرحَبًا بِالعَالَم"),  # Arabic + tashkeel
    (4, "tab\tsep nbsp sep line\nbreak"),  # whitespace variants
    (5, "\U00010348 gothic \U0001d11e clef"),  # supplementary plane
    (6, "latin中文mix Ж Ω א"),  # mixed scripts
    (7, "a" * 3 + " " + "中" * 3),  # ascii+CJK runs
    (10, "The quick brown fox jumps over the lazy dog. " * 3),  # plain control
]


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
    w(
        "lineitem",
        "SELECT CAST(1 AS BIGINT) l_orderkey, CAST(1 AS BIGINT) l_partkey, "
        "CAST(1 AS BIGINT) l_suppkey, CAST(1 AS INTEGER) l_linenumber, "
        "CAST(1.0 AS DOUBLE) l_quantity, CAST(10.0 AS DOUBLE) l_extendedprice, "
        "CAST(0.0 AS DOUBLE) l_discount, CAST(0.0 AS DOUBLE) l_tax, "
        "'N' l_returnflag, 'O' l_linestatus, TIMESTAMP '1995-02-01 00:00:00' l_shipdate",
    )
    w(
        "events",
        "SELECT * FROM (VALUES "
        "(CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 10:00:00', CAST(1 AS BIGINT), "
        "'view', CAST(5.0 AS DOUBLE), '{}'), "
        "(CAST(2 AS BIGINT), TIMESTAMP '2024-01-01 10:20:00', CAST(1 AS BIGINT), "
        "'purchase', CAST(7.0 AS DOUBLE), '{}')"
        ") t(event_id, ts, user_id, event_type, value, props)",
    )
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    for did, text in DOCS:
        con.execute(
            "INSERT INTO docs VALUES (?, ?, 'xx', 's', ?)", [did, text, len(text)]
        )
    con.execute(f"COPY (SELECT * FROM docs) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    for vid in (0, 5, 7, 50):
        con.execute(
            "INSERT INTO emb VALUES (?, ?, ?)", [vid, [float(vid % 3 + 1)] * 64, 1]
        )
    con.execute(f"COPY (SELECT * FROM emb) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


def main() -> None:
    out = tempfile.mkdtemp(prefix="unicode_sf_")
    build_fixture(out)
    spark = get_spark("unicode-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    oracles = registry.oracle_sql(out)
    con = duck_connection(out)
    crashed, mismatched, matched, ran = [], [], 0, 0
    # twin-match every key whose oracle touches the documents table's
    # text column — the unicode-sensitive surface.
    text_keys = [k for k, sql in oracles.items() if "documents" in sql]
    for key, fn in qs.items():
        try:
            df = fn(spark, out)
            if key in text_keys:
                got = sorted(map(tuple, df.collect()), key=repr)
            else:
                df.count()
                ran += 1
                continue
        except Exception as e:
            crashed.append((key, f"{type(e).__name__}: {str(e)[:160]}"))
            continue
        try:
            want = sorted(map(tuple, con.execute(oracles[key]).fetchall()), key=repr)
        except Exception as e:
            crashed.append((key, f"ORACLE {type(e).__name__}: {str(e)[:160]}"))
            continue
        ok = len(got) == len(want)
        if ok:
            for g, w in zip(got, want):
                if repr(g) != repr(w):
                    try:
                        import pytest  # noqa: F401

                        approx_ok = all(
                            (a == b)
                            or (
                                isinstance(a, float)
                                and isinstance(b, float)
                                and abs(a - b) <= 1e-4
                            )
                            for a, b in zip(g, w)
                        ) and len(g) == len(w)
                    except Exception:
                        approx_ok = False
                    if not approx_ok:
                        ok = False
                        break
        if ok:
            matched += 1
        else:
            mismatched.append((key, got[:3], want[:3]))
    print(f"fixture: {out}")
    print(f"ran-only ok: {ran}; text twin-matched: {matched}/{len(text_keys)}")
    print(f"CRASHED ({len(crashed)}):")
    for k, e in crashed:
        print(f"  {k}: {e}")
    print(f"MISMATCHED ({len(mismatched)}):")
    for k, g, w in mismatched:
        print(f"  {k}:\n    got  {g}\n    want {w}")


if __name__ == "__main__":
    main()
