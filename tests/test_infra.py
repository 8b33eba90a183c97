"""Round-3 infrastructure units: SessionMemo lifecycle (ADVICE r02),
the RDD-free narrow-scan probe, and parquet-footer row counting."""

from __future__ import annotations

from knn_with_mapreduce_cuda_spark import tables
from tests.conftest import SF_SMOKE


class _Owner:  # weakref-able stand-in for a SparkSession
    pass


def test_session_memo_weak_lifecycle():
    memo = tables.SessionMemo()
    a = _Owner()
    memo.put(a, ("/d", "t"), "plan-a")
    assert memo.get(a, ("/d", "t")) == "plan-a"
    # a different owner with the same key shape gets no hit
    b = _Owner()
    assert memo.get(b, ("/d", "t")) is None
    # entries of a collected owner are purged on the next put and can
    # never be served to an owner that reuses the same id()
    a_id_entries = len(memo._m)
    del a
    memo.put(b, ("/d2", "t"), "plan-b")
    assert all(ref() is not None for ref, _ in memo._m.values())
    assert len(memo._m) <= a_id_entries + 1


def test_session_memo_evicts_stopped_sessions():
    """A memoized DataFrame strongly references its session, so the
    weakref alone never dies — eviction must key on the session being
    STOPPED (the actual ADVICE r02 leak)."""
    from types import SimpleNamespace

    class _Session:  # weakref-able, unlike SimpleNamespace
        def __init__(self, stopped):
            self.sparkContext = SimpleNamespace(
                _jsc=SimpleNamespace(
                    sc=lambda: SimpleNamespace(isStopped=lambda: stopped)
                )
            )

    owner = _Session

    memo = tables.SessionMemo()
    live, dead = owner(False), owner(True)
    memo.put(live, ("/d", "t"), "live-plan")
    memo.put(dead, ("/d", "t"), "dead-plan")
    # a stopped session is never served, even while strongly referenced
    assert memo.get(dead, ("/d", "t")) is None
    assert memo.get(live, ("/d", "t")) == "live-plan"
    # ... and its entries are purged on the next put
    memo.put(live, ("/d2", "t"), "x")
    assert len(memo._m) == 2


def test_session_memo_invalidate():
    memo = tables.SessionMemo()
    o = _Owner()
    memo.put(o, ("/scratch", "lineitem"), "x")
    memo.put(o, ("/other", "orders"), "y")
    memo.invalidate("/scratch/")
    assert memo.get(o, ("/scratch", "lineitem")) is None
    assert memo.get(o, ("/other", "orders")) == "y"


def test_invalidate_caches_clears_table_memo(spark):
    df1 = tables.table(spark, SF_SMOKE, "region")
    assert tables.table(spark, SF_SMOKE, "region") is df1  # memo hit
    tables.invalidate_caches(SF_SMOKE)
    df2 = tables.table(spark, SF_SMOKE, "region")
    assert df2 is not df1  # fresh plan after invalidation


def test_fixture_rows_matches_count(spark):
    from knn_with_mapreduce_cuda_spark.operators.llm import _fixture_rows

    n = _fixture_rows(SF_SMOKE, "documents")
    assert n == tables.table(spark, SF_SMOKE, "documents").count()


def test_arrives_narrow_probe(spark, tmp_path):
    from knn_with_mapreduce_cuda_spark.operators.llm import _arrives_narrow

    docs = tables.table(spark, SF_SMOKE, "documents")
    # single small fixture file → narrow (needs the fan-out)
    assert _arrives_narrow(spark, docs) is True
    # many-file layout → trusted as already parallel
    wide_dir = str(tmp_path / "wide")
    docs.repartition(32).write.parquet(wide_dir)
    assert _arrives_narrow(spark, spark.read.parquet(wide_dir)) is False
    # non-file relation → trusted
    assert _arrives_narrow(spark, spark.range(10)) is False


def test_knn_self_join_memo_and_invalidate(spark):
    from knn_with_mapreduce_cuda_spark.operators.knn import knn_self_join

    e1 = knn_self_join(spark, SF_SMOKE, 5)
    assert knn_self_join(spark, SF_SMOKE, 5) is e1  # memo hit
    assert knn_self_join(spark, SF_SMOKE, 3) is not e1  # k is part of the key
    tables.invalidate_caches(SF_SMOKE)
    assert knn_self_join(spark, SF_SMOKE, 5) is not e1  # dropped with the dir


def test_materialize_ctes_contract():
    """ADVICE r05: the CTE pin tolerates whitespace / non-SELECT bodies,
    skips string literals, is idempotent-guarded, and fails loudly on a
    silent non-rewrite or an unexpected substitution count."""
    import pytest

    from knn_with_mapreduce_cuda_spark.oracle import materialize_ctes

    assert (
        materialize_ctes("WITH a AS (SELECT 1) SELECT * FROM a")
        == "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a"
    )
    # whitespace + lowercase + paren-opening body all rewrite
    out = materialize_ctes(
        "WITH a AS\n (\n select 1), b AS ((SELECT 2) UNION ALL (SELECT 3)) "
        "SELECT 'x AS (SELECT' FROM a, b", expected=2
    )
    assert out.count("MATERIALIZED") == 2
    assert "'x AS (SELECT'" in out  # string literal untouched
    # a window definition is NOT a CTE head
    with pytest.raises(ValueError, match="no CTE head"):
        materialize_ctes("SELECT sum(x) OVER w FROM t WINDOW w AS (ORDER BY x)")
    with pytest.raises(ValueError, match="expected 2"):
        materialize_ctes("WITH a AS (SELECT 1) SELECT 1", expected=2)
    # already-pinned SQL has no bare heads left -> loud, not silent
    pinned = materialize_ctes("WITH a AS (SELECT 1) SELECT 1")
    with pytest.raises(ValueError, match="no CTE head"):
        materialize_ctes(pinned)


def test_materialize_ctes_lexes_comments_and_quotes():
    """ADVICE r06 #3: an apostrophe inside a comment must not flip the
    code/literal parity — the scanner tracks real lexical state, so CTE
    heads AFTER a comment-with-apostrophe still rewrite, heads INSIDE
    comments / double-quoted identifiers / dollar-quoted strings never
    do, and the rewritten SQL stays valid."""
    import duckdb
    import pytest

    from knn_with_mapreduce_cuda_spark.oracle import materialize_ctes

    # apostrophe in a line comment, CTE after it: old parity split
    # would treat everything after the ' as a string literal and skip b
    sql = (
        "WITH a AS (SELECT 1 AS x), -- tom's note\n"
        "b AS (SELECT 2 AS x) SELECT * FROM a UNION ALL SELECT * FROM b"
    )
    out = materialize_ctes(sql, expected=2)
    assert out.count("MATERIALIZED") == 2
    assert duckdb.connect().execute(out).fetchall() == [(1,), (2,)]
    # apostrophe in a (nested) block comment
    out = materialize_ctes(
        "WITH a AS (SELECT 1) /* it's /* nested, isn't it */ fine */ "
        "SELECT * FROM a",
        expected=1,
    )
    assert "nested, isn't it" in out
    # a commented-out CTE head is NOT rewritten
    with pytest.raises(ValueError, match="no CTE head"):
        materialize_ctes("-- a AS (SELECT 1)\nSELECT 1")
    # double-quoted identifier and dollar-quoted literal are opaque
    out = materialize_ctes(
        'WITH a AS (SELECT \'b AS (SELECT\' AS "c AS (SELECT", '
        "$$d AS (SELECT$$ AS e) SELECT * FROM a",
        expected=1,
    )
    assert out.count("MATERIALIZED") == 1


def test_code_segments_escape_string_literals():
    """ADVICE r07 #2: an E'...' escape-string literal honors backslash
    escapes — E'it\\'s' must not end the literal at the escaped quote
    and flip code/literal state for the rest of the statement. A plain
    literal keeps standard SQL semantics (backslash is NOT an escape),
    and a word ending in e (CASE/ELSE, a column named e) must not
    trigger escape mode."""
    import duckdb

    from knn_with_mapreduce_cuda_spark.oracle import (
        _code_segments,
        materialize_ctes,
    )

    # escaped quote inside E'...': the CTE head AFTER it must rewrite
    sql = (
        "WITH a AS (SELECT E'it\\'s' AS x), b AS (SELECT 2 AS x) "
        "SELECT x FROM a UNION ALL SELECT CAST(x AS VARCHAR) FROM b"
    )
    out = materialize_ctes(sql, expected=2)
    assert out.count("MATERIALIZED") == 2
    assert "E'it\\'s'" in out  # literal untouched
    assert sorted(r[0] for r in duckdb.connect().execute(out).fetchall()) == [
        "2",
        "it's",
    ]
    # a plain literal does NOT treat backslash as an escape: '\' is a
    # complete one-backslash string, and code resumes after it
    segs = _code_segments("SELECT '\\' AS x, 1 AS y")
    assert (False, "'\\'") in segs
    assert any(is_code and "1 AS y" in text for is_code, text in segs)
    # ELSE'...' / a column named e: the quote opens a PLAIN literal
    # (backslash kept verbatim, literal ends at the first quote) — the
    # preceding word character means the E is not a standalone prefix
    segs = _code_segments("SELECT CASE WHEN b THEN 'x' ELSE'y' END")
    assert (False, "'y'") in segs


def test_hash_compare_fingerprint_semantics():
    """VERDICT r05 #2: the server-side fingerprint settles equal frames
    without fetching oracle rows, refuses anything it can't hash
    type-safely, and NEVER false-passes — value drift, -0.0 drift and
    NaN drift all force the exact path (or an immediate red)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from knn_with_mapreduce_cuda_spark.oracle import CompareResult, _hash_compare

    con = duckdb.connect()
    n = 1000
    base = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "v": np.arange(n, dtype=np.float64) / 7.0,
            "s": [f"row-{i}" for i in range(n)],
        }
    )
    con.register("base", base)

    def run(spdf, sql):
        res = CompareResult("t", True, "")
        settled = _hash_compare(res, spdf, sql, con)
        return settled, res

    settled, res = run(base, "SELECT * FROM base")
    assert settled and res.ok and res.spark_rows == n == res.duck_rows
    # column order on either side is irrelevant
    settled, res = run(base[["s", "v", "k"]], "SELECT v, s, k FROM base")
    assert settled and res.ok
    # a single drifted value cannot settle as equal
    drift = base.copy()
    drift.loc[500, "v"] = drift.loc[500, "v"] + 1e-9
    settled, res = run(drift, "SELECT * FROM base")
    assert not settled  # falls back to the exact path's row diff
    # -0.0 drift: duckdb hash(±0.0) collides — the signbit term catches it
    negz = base.copy()
    negz.loc[0, "v"] = -0.0
    assert negz.loc[0, "v"] == base.loc[0, "v"]  # == can't see it; we must
    settled, res = run(negz, "SELECT * FROM base")
    assert not settled
    # NaN drift: NaN folds to NULL on both sides (the exact path's own
    # null/NaN conflation in float columns), so a NaN-vs-value drift
    # cannot settle as equal
    nan = base.copy()
    nan.loc[1, "v"] = float("nan")
    settled, res = run(nan, "SELECT * FROM base")
    assert not settled
    # equal NaNs on both sides settle as equal (both fold to NULL)
    settled, res = run(
        nan, "SELECT k, CASE WHEN k = 1 THEN 'nan'::DOUBLE ELSE v END AS v, s FROM base"
    )
    assert settled and res.ok
    # ...and a duck-side NULL equals a spark-side NaN — exactly the
    # exact path's semantics (fetchdf returns NULL doubles as NaN)
    settled, res = run(
        nan, "SELECT k, CASE WHEN k = 1 THEN NULL ELSE v END AS v, s FROM base"
    )
    assert settled and res.ok
    # row-count mismatch settles immediately as a red with counts
    settled, res = run(base, "SELECT * FROM base WHERE k < 999")
    assert settled and not res.ok and "row count differs" in res.detail
    # unsupported spark-side type (lists) refuses the fast path
    lists = base.assign(arr=[[1, 2]] * n)
    settled, res = run(lists, "SELECT *, [1, 2] AS arr FROM base")
    assert not settled
    # int-vs-float type drift between the sides refuses (exact path decides)
    settled, res = run(base, "SELECT CAST(k AS DOUBLE) AS k, v, s FROM base")
    assert settled is False or not res.ok


def test_fingerprint_carries_two_hash_families():
    """ADVICE r06 #2: the multiset fingerprint must include a second,
    independent (salted) hash family — a pair of distinct multisets
    colliding on (count, sum, xor) of one 64-bit hash then has to
    collide on the second family too. Pin the structure (both families,
    sum+xor each) and that the families really are independent: rows
    hashing equal under family 1 terms hash different under family 2."""
    import duckdb

    from knn_with_mapreduce_cuda_spark.oracle import _fingerprint_sql

    sql = _fingerprint_sql([("k", "int")], "t")
    assert sql.count("hash(ROW(") == 4  # sum+xor for each of 2 families
    assert "fp2_salt" in sql
    con = duckdb.connect()
    h1, h2 = con.execute(
        "SELECT hash(ROW(CAST(7 AS BIGINT))), "
        "hash(ROW('fp2_salt', CAST(7 AS BIGINT)))"
    ).fetchone()
    assert h1 != h2


def test_cluster_confs_match_scale_doc():
    """VERDICT r08 #7: session.cluster_confs() IS SCALE.md §0's knob set
    — pin the profile to the documented numbers (and to the doc text for
    the load-bearing literals) so the deploy profile and the sizing
    arithmetic can't drift apart."""
    import os

    from knn_with_mapreduce_cuda_spark.session import (
        RUNTIME_CONFS,
        cluster_confs,
    )

    confs = cluster_confs()  # §0 model: 1000 executors x 4 cores
    # input splits: 128 MiB => ~800k scan tasks over 100 TB
    assert confs["spark.sql.files.maxPartitionBytes"] == "128m"
    # shuffle-partition ceiling within the documented 2-3x cores band
    sp = int(confs["spark.sql.shuffle.partitions"])
    assert 2 * 4000 <= sp <= 3 * 4000
    assert int(cluster_confs(total_cores=800)["spark.sql.shuffle.partitions"]) in range(1600, 2401)
    # AQE: coalesce small stages under the ceiling, split skewed joins
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
    ):
        assert confs[k] == "true"
    # broadcast ceiling stays at the 10 MB default (explicit
    # F.broadcast everywhere an operator bounds a side)
    assert int(confs["spark.sql.autoBroadcastJoinThreshold"]) == 10 * 1024 * 1024
    # correctness confs ride along: a cluster session built from this
    # dict alone must read the fixtures and agree with the oracle
    for k, v in RUNTIME_CONFS.items():
        assert confs[k] == v
    # the doc carries the same literals this profile encodes
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sec0 = open(os.path.join(root, "SCALE.md")).read().split("## 1.")[0]
    assert "maxPartitionBytes=128m" in sec0
    assert "2–3× total cores" in sec0
    assert "10 MB" in sec0


def test_legacy_bigint_nanos_floor_to_micros(spark, tmp_path):
    """The legacy events arrival form (bigint nanoseconds under
    nanosAsLong) must FLOOR to microseconds, matching the native
    ≥4.1.2 read path, DuckDB's nanos cast, and IEEE floor — Spark's
    `div` truncates toward zero, which silently shifted every
    pre-1970 event by 1 µs (r11 temporal sweep finding). Negative,
    zero, and positive nanos all pinned."""
    import duckdb

    from knn_with_mapreduce_cuda_spark import tables

    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM (VALUES "
        "(CAST(1 AS BIGINT), CAST(-999999999 AS BIGINT), CAST(1 AS BIGINT), "
        "'view', 1.0, '{}'), "
        "(CAST(2 AS BIGINT), CAST(-1 AS BIGINT), CAST(1 AS BIGINT), "
        "'view', 1.0, '{}'), "
        "(CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), "
        "'view', 1.0, '{}'), "
        "(CAST(4 AS BIGINT), CAST(1999 AS BIGINT), CAST(1 AS BIGINT), "
        "'view', 1.0, '{}')"
        ") t(event_id, ts, user_id, event_type, value, props)) "
        f"TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    got = {
        r["event_id"]: r["ts_us"]
        for r in tables.table(spark, str(tmp_path), "events")
        .select("event_id", "ts_us")
        .collect()
    }
    # floor(-999999999/1000) = -1000000 (NOT div's -999999),
    # floor(-1/1000) = -1 (NOT 0), floor(0) = 0, floor(1999/1000) = 1
    assert got == {1: -1000000, 2: -1, 3: 0, 4: 1}
