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
import numpy as np
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


_DOLLAR_TAG = re.compile(r"\$[A-Za-z_]\w*\$|\$\$")


def _code_segments(sql: str) -> list[tuple[bool, str]]:
    """Lex ``sql`` into (is_code, text) segments: string literals
    (single-quoted with '' escapes, dollar-quoted), double-quoted
    identifiers, line comments and (nested, Postgres/DuckDB-style)
    block comments are NON-code, everything else is code. A plain
    quote-parity split misreads an apostrophe inside a comment as a
    string-literal boundary and flips code/literal for the rest of the
    statement (ADVICE r06 #3) — this scanner tracks the real state.
    E'...' escape-string literals (ADVICE r07 #2) are handled too: a
    quote opened by a standalone E/e prefix honors backslash escapes,
    so E'it\\'s' no longer ends the literal early."""
    segs: list[tuple[bool, str]] = []
    i, n, start = 0, len(sql), 0

    def _flush(end: int, is_code: bool) -> None:
        nonlocal start
        if end > start:
            segs.append((is_code, sql[start:end]))
        start = end

    def _is_escape_prefix(pos: int) -> bool:
        # quote at `pos` preceded by a standalone E/e (not the tail of
        # an identifier like TABLE_E'...' can't occur, but CASE...ELSE
        # or a column named e must not trigger: require the char before
        # the E to be a non-word char or start-of-string).
        if pos < 1 or sql[pos - 1] not in "Ee":
            return False
        return pos < 2 or not (sql[pos - 2].isalnum() or sql[pos - 2] == "_")

    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if ch == "'":
            backslash_escapes = _is_escape_prefix(i)
            _flush(i, True)
            j = i + 1
            while j < n:
                if backslash_escapes and sql[j] == "\\" and j + 1 < n:
                    j += 2  # \' \\ etc. stay inside the literal
                    continue
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            _flush(j, False)
            i = j
        elif ch == '"':
            _flush(i, True)
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':  # "" escape
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            _flush(j, False)
            i = j
        elif ch == "-" and nxt == "-":
            _flush(i, True)
            j = sql.find("\n", i)
            j = n if j == -1 else j + 1
            _flush(j, False)
            i = j
        elif ch == "/" and nxt == "*":
            _flush(i, True)
            depth, j = 1, i + 2
            while j < n and depth:
                if sql.startswith("/*", j):
                    depth, j = depth + 1, j + 2
                elif sql.startswith("*/", j):
                    depth, j = depth - 1, j + 2
                else:
                    j += 1
            _flush(j, False)
            i = j
        elif ch == "$":
            m = _DOLLAR_TAG.match(sql, i)
            if m:
                _flush(i, True)
                close = sql.find(m.group(0), m.end())
                j = n if close == -1 else close + len(m.group(0))
                _flush(j, False)
                i = j
            else:
                i += 1
        else:
            i += 1
    _flush(n, True)
    return segs


def materialize_ctes(sql: str, expected: int | None = None) -> str:
    """Pin every CTE in ``sql`` as MATERIALIZED. DuckDB re-evaluates a
    non-materialized CTE at every reference; inside a WITH RECURSIVE
    iteration that turns an O(1)-pass base relation into O(iterations)
    full re-scans (measured 11.6 s → 0.8 s on ts_holt_linear at sf0.1,
    ~5 s → <1 s on each label-propagation oracle). Values are
    unchanged — materialization is a physical hint (verified per key
    before adoption).

    String literals, quoted identifiers and comments are never
    rewritten (``_code_segments`` tracks the real lexical state, so an
    apostrophe inside a comment can't flip the code/literal parity the
    way the old split-on-quote did). A call that rewrites nothing
    raises — every caller wraps SQL known to carry CTEs, so a silent
    non-rewrite is a bug; pass ``expected`` to pin the exact count."""
    hits = 0

    def _sub(m: re.Match) -> str:
        nonlocal hits
        hits += 1
        return f"{m.group(1)} AS MATERIALIZED ("

    out = [
        _CTE_HEAD.sub(_sub, text) if is_code else text
        for is_code, text in _code_segments(sql)
    ]
    if expected is not None and hits != expected:
        raise ValueError(f"materialize_ctes: rewrote {hits} CTE heads, expected {expected}")
    if hits == 0:
        raise ValueError("materialize_ctes: no CTE head matched — nothing rewritten")
    return "".join(out)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        if name == "events":
            # The oracle-side twin of tables.table's ingest
            # canonicalization (the layer that already owns the ts
            # normalization): non-finite measurements are MISSING DATA
            # — NaN/Inf `value` maps to NULL on BOTH engines, so every
            # downstream quantization/aggregate agrees instead of one
            # side crashing (r10 non-finite sweep). Identity on finite
            # values.
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * REPLACE ("
                "CASE WHEN isnan(value) OR isinf(value) THEN NULL "
                "ELSE value END AS value) "
                f"FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
            continue
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
    # NULLABLE-BOOLEAN normalization: a NULL in a boolean column comes
    # back as None from Spark's toPandas but as float NaN from DuckDB's
    # .df() (both land in an object-dtype column) — a boolean column
    # cannot hold a REAL NaN, so NaN there is unambiguously NULL and
    # both spellings must canonicalize identically (r11 non-finite
    # sweep: rel_fn_higher_order2's any_big/all_small on a poisoned
    # vector). Float columns are untouched: there NaN is a value.
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object:
            nonnull = s.dropna()
            if len(nonnull) and all(
                isinstance(x, (bool, np.bool_)) for x in nonnull
            ):
                pdf[c] = s.where(s.notna(), None)
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


#: spark-side row count above which compare() tries the server-side
#: fingerprint before the exact python canon+sort (which costs ~8 s/M
#: rows — the r05 sweep tail: rel_unpivot 14.5 s, rel_fn_math 13.5 s
#: of pure comparator on equal frames; VERDICT r05 #2).
HASH_ROWS_MIN = 100_000

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_DUCK_RAW = {"VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


def _fingerprint_sql(cols: list[tuple[str, str]], rel: str) -> str:
    """Order-insensitive multiset fingerprint of ``rel`` — count, sum and
    bit_xor of per-row hashes from TWO independent hash families (plain
    and salted; ADVICE r06 #2) over the name-sorted columns (ints pinned
    to BIGINT, floats to DOUBLE so both sides hash identical types),
    plus a per-float-column -0.0 count: DuckDB's hash() maps both zero
    signs to 0, and this term restores the strictness the exact path's
    repr() check has (SURVEY §7.2 normalizes -0.0 away, so the expected
    count is zero on both sides; residual weakness — a -0.0 *placement*
    swap inside otherwise-equal frames — is also invisible to
    hash+counts, which is why audit_negzero.py stays in the round-close
    gate). Float NaNs fold to NULL on BOTH sides: the exact path
    already conflates null/NaN in float columns (Spark nulls arrive as
    pandas NaN, DuckDB NULLs leave fetchdf as NaN, and registration
    maps pandas NaN back to NULL), so the symmetric fold reproduces
    exactly the comparison the exact path performs."""
    terms, extras = [], []
    for name, kind in cols:
        qc = '"' + name.replace('"', '""') + '"'
        if kind == "float":
            cast = f"CAST({qc} AS DOUBLE)"
            expr = f"(CASE WHEN isnan({cast}) THEN NULL ELSE {cast} END)"
            extras.append(
                f"count(CASE WHEN signbit({expr}) AND {expr} = 0 THEN 1 END)"
            )
        elif kind == "int":
            expr = f"CAST({qc} AS BIGINT)"
        else:
            expr = qc
        terms.append(expr)
    row = f"hash(ROW({', '.join(terms)}))"
    # Independent second fingerprint family (ADVICE r06 #2): a salt
    # term makes hash() a different function of the row, so a multiset
    # pair colliding on (count, sum, xor) of the first hash would also
    # have to collide on the salted sum+xor — pushing the false-green
    # odds from ~2^-64-ish structured-collision territory to
    # negligible. Squaring the first hash instead would overflow
    # HUGEINT (hash() is UBIGINT, its square needs 128 unsigned bits);
    # the salted family costs the same single scan and stays exact.
    row2 = f"hash(ROW('fp2_salt', {', '.join(terms)}))"
    sel = [
        "count(*)",
        f"sum(CAST({row} AS HUGEINT))",
        f"bit_xor({row})",
        f"sum(CAST({row2} AS HUGEINT))",
        f"bit_xor({row2})",
    ]
    return f"SELECT {', '.join(sel + extras)} FROM {rel}"


def _duck_kind(duck_type: str) -> str | None:
    t = duck_type.upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    if t in _DUCK_RAW:
        return "raw"
    return None  # unsupported for fingerprinting → exact path


def _pandas_kind(series: pd.Series) -> str | None:
    from pandas.api import types as pt

    dt = series.dtype
    if pt.is_bool_dtype(dt):
        return "raw"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    if pt.is_datetime64_any_dtype(dt):
        return "raw"
    if dt == object:
        # strings fingerprint as VARCHAR; anything else (lists, decimals,
        # mixed) keeps the exact path
        inferred = pt.infer_dtype(series, skipna=True)
        return "raw" if inferred in ("string", "empty") else None
    return None


def _hash_compare(res: CompareResult, spdf: pd.DataFrame, sql: str, con) -> bool:
    """Server-side fingerprint compare (VERDICT r05 #2): the oracle rows
    never leave DuckDB (no fetchdf), the Spark frame is fingerprinted by
    the SAME engine over a zero-copy registration, and only the
    (count, sum-of-row-hashes, xor-of-row-hashes, float sign/NaN
    counts) tuples are compared. Returns True when it settled the
    comparison (res filled in); False → caller runs the exact path
    (unsupported type, fingerprint error, or a mismatch that needs the
    detailed diff)."""
    cols = sorted(spdf.columns)
    s_cols = []
    for c in cols:
        kind = _pandas_kind(spdf[c])
        if kind is None:
            return False
        s_cols.append((c, kind))
    try:
        desc = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    except Exception:
        return False  # let the exact path surface the real SQL error
    d_kinds = {r[0]: _duck_kind(r[1]) for r in desc}
    if sorted(d_kinds) != cols:
        return False  # column mismatch → exact path reports it
    d_cols = [(c, d_kinds[c]) for c in cols]
    if any(k is None for _, k in d_cols):
        return False
    try:
        con.register("__spark_fp", spdf)
        try:
            s_fp = con.execute(_fingerprint_sql(s_cols, "__spark_fp")).fetchone()
        finally:
            con.unregister("__spark_fp")
        d_fp = con.execute(_fingerprint_sql(d_cols, f"({sql})")).fetchone()
    except Exception:
        return False
    res.spark_rows, res.duck_rows = int(s_fp[0]), int(d_fp[0])
    if s_fp[0] != d_fp[0]:
        res.ok = False
        res.detail = f"row count differs: spark={s_fp[0]} duck={d_fp[0]}"
        return True
    if s_fp != d_fp:
        return False  # exact path produces the row-level diff
    res.ok = True
    return True


def compare(name: str, spark_df, sql: str, con) -> CompareResult:
    try:
        spdf = spark_df.toPandas()
    except Exception as e:  # noqa: BLE001
        return CompareResult(name, False, f"spark error: {str(e)[:500]}")

    res = CompareResult(name, True, "", len(spdf), -1)
    if len(spdf) >= HASH_ROWS_MIN and _hash_compare(res, spdf, sql, con):
        return res

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
