"""Local replica of the driver's t2 DuckDB-oracle gate (SURVEY.md §5.2).

Runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]`` on
DuckDB over the same parquet fixtures, then compares row count, column
names, and values (order-insensitive, strict after the §7.2 rounding
conventions). Failures surface here before the grading driver runs.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import duckdb
import pandas as pd

from .tables import TABLE_NAMES

#: a CTE head: `<name> AS (` with any whitespace, where the body opens
#: with SELECT/WITH/FROM/VALUES or a parenthesis (ADVICE r05: the old
#: pattern required exactly ` AS (SELECT`, silently skipping other body
#: shapes). `AS MATERIALIZED (` never matches, so the rewrite is
#: idempotent; `name AS (` is unambiguous in SQL outside string
#: literals (aliases are `(...) AS name`; casts are `CAST(x AS type)`).
_CTE_HEAD = re.compile(
    r"\b(\w+)\s+AS\s+\(\s*(?=SELECT\b|WITH\b|FROM\b|VALUES\b|\()",
    re.IGNORECASE,
)


def materialize_ctes(sql: str, expected: int | None = None) -> str:
    """Pin every CTE in ``sql`` as MATERIALIZED. DuckDB re-evaluates a
    non-materialized CTE at every reference; inside a WITH RECURSIVE
    iteration that turns an O(1)-pass base relation into O(iterations)
    full re-scans (measured 11.6 s → 0.8 s on ts_holt_linear at sf0.1,
    ~5 s → <1 s on each label-propagation oracle). Values are
    unchanged — materialization is a physical hint (verified per key
    before adoption).

    Single-quoted string literals are never rewritten ('' escapes
    handled by the split parity). A call that rewrites nothing raises
    — every caller wraps SQL known to carry CTEs, so a silent
    non-rewrite is a bug; pass ``expected`` to pin the exact count."""
    # split on ' — even segments are code, odd are string-literal
    # bodies ('' escapes land as empty even segments, still not code
    # that can contain a CTE head)
    parts = sql.split("'")
    hits = 0

    def _sub(m: re.Match) -> str:
        nonlocal hits
        hits += 1
        return f"{m.group(1)} AS MATERIALIZED ("

    for i in range(0, len(parts), 2):
        parts[i] = _CTE_HEAD.sub(_sub, parts[i])
    if expected is not None and hits != expected:
        raise ValueError(f"materialize_ctes: rewrote {hits} CTE heads, expected {expected}")
    if hits == 0:
        raise ValueError("materialize_ctes: no CTE head matched — nothing rewritten")
    return "'".join(parts)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # DRIVER-STRICT: exact repr — distinguishes -0.0 from 0.0 and any
        # last-ulp drift. Queries must emit bit-identical doubles on both
        # engines (round(,4) + "+ 0.0" -0.0 normalization, SURVEY §7.2).
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    if isinstance(v, bool):
        return bool(v)
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    # any deterministic total order works (both sides sort by the same
    # key; equality is checked on the canonical tuples themselves, and
    # repr is injective on the canonical cell types — floats are already
    # repr-strings). repr is ~3x faster than the per-cell tuple key on
    # the million-row outputs (rel_unpivot, knn_dist_*).
    return sorted(rows, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    duck_rows: int = -1


def compare(name: str, spark_df, sql: str, con) -> CompareResult:
    try:
        spdf = spark_df.toPandas()
    except Exception as e:  # noqa: BLE001
        return CompareResult(name, False, f"spark error: {str(e)[:500]}")
    try:
        dpdf = con.execute(sql).fetchdf()
    except Exception as e:  # noqa: BLE001
        return CompareResult(name, False, f"duckdb error: {str(e)[:500]}")

    res = CompareResult(name, True, "", len(spdf), len(dpdf))
    if sorted(spdf.columns) != sorted(dpdf.columns):
        res.ok = False
        res.detail = f"columns differ: spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
        return res
    if len(spdf) != len(dpdf):
        res.ok = False
        res.detail = f"row count differs: spark={len(spdf)} duck={len(dpdf)}"
        return res
    s_rows, d_rows = canonical_rows(spdf), canonical_rows(dpdf)
    if s_rows != d_rows:
        bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
        first = next(((a, b) for a, b in zip(s_rows, d_rows) if a != b), None)
        res.ok = False
        res.detail = f"{bad}/{len(s_rows)} rows differ; first: spark={first[0]} duck={first[1]}"
    return res
