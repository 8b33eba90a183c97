"""Vector distance expressions — JVM-side, whole-stage-codegen friendly.

Parity note (SURVEY.md §2.T1): the reference repo class computes these in
``Mapper.distance()`` (Java) and a tiled CUDA kernel. Here every metric is
a Catalyst expression built from ``zip_with`` + ``aggregate`` higher-order
functions: no Python in the hot path, deterministic left-fold accumulation
(bit-identical to DuckDB's sequential double accumulation, which the
oracle relies on).

Scale design: expressions stay inside WholeStageCodegen; the vectorized
NumPy/GEMM physical strategy for bulk kNN lives in ``plans/gemm_knn.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def sq_euclidean(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(sq_euclidean(a, b))


def manhattan(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, x: s + x
    )


def chebyshev(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, x: F.greatest(s, x)
    )


def minkowski3(a: Column | str, b: Column | str) -> Column:
    """Minkowski distance with p=3 — the generalization between L1 (p=1)
    and L∞ (Chebyshev); satisfies chebyshev ≤ minkowski3 ≤ manhattan."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    summed = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.pow(F.abs(x - y), F.lit(3.0))),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return F.pow(summed, F.lit(1.0) / F.lit(3.0))


def hamming_sign(a: Column | str, b: Column | str) -> Column:
    """Hamming distance over sign bits — binarize each dimension by
    sign(x) ≥ 0 and count disagreements. The 1-bit quantization used by
    binary-embedding ANN (SimHash's geometric cousin); integer-valued, so
    exact under any accumulation order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    # NULL components POISON the distance (propagate NULL) like every
    # arithmetic metric, instead of silently counting as a sign
    # agreement (the old CASE's ELSE swallowed the NULL comparison) —
    # the engine-wide corrupt-vector convention (r10 non-finite sweep).
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.when(x.isNull() | y.isNull(), F.lit(None).cast("double"))
            .when((x >= 0) != (y >= 0), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    # try_divide, not /: a zero-norm vector (all-zero embedding — a
    # realistic artifact of a broken upstream encoder) makes the norm
    # product 0, which under Spark 4's default ANSI mode CRASHES the
    # whole job (DIVIDE_BY_ZERO) while DuckDB yields NULL for x/0.0.
    # try_divide returns NULL on a zero divisor — bit-identical to / on
    # every nonzero norm (golden digests unchanged) and twin-consistent
    # with the oracle on the degenerate input (r09 degenerate-fixture
    # sweep; regression-tested in tests/test_degenerate_inputs.py).
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


METRICS = {
    "euclidean": euclidean,
    "sqeuclidean": sq_euclidean,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "minkowski3": minkowski3,
    "hamming": hamming_sign,
    "cosine": cosine,
    "dot": dot,
}
