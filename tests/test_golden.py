"""Golden value digests for the SURVEY §2 contract (all 67 keys).

The DuckDB oracle gate proves Spark == oracle on every run; these
digests pin the VALUES against history. The failure class they catch is
agreeing corruption — a change where the Spark query and its oracle SQL
drift together (e.g. an edited constant, a silently re-derived model)
hash-grades green at the oracle gate but fails here. An intentional
output change must be made explicit: `python scripts/gen_golden.py
--fix` plus re-fronting the key per the _RE_EARNED rotation discipline
(registry.py).

Determinism is already load-bearing for these keys (every one is
hash-graded vs DuckDB, and the partitioning shake re-proves value
stability at 5 CPUs / 7 shuffle partitions each round), so a digest
mismatch is a real output change, not flake.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from knn_with_mapreduce_cuda_spark import registry
from knn_with_mapreduce_cuda_spark.oracle import canonical_rows
from tests.conftest import SF_SMOKE

_GOLDEN = json.load(
    open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_smoke_digests.json"))
)


def test_golden_covers_exactly_the_survey_contract():
    assert set(_GOLDEN) == set(registry.SURVEY_QKEYS)


@pytest.mark.parametrize("key", sorted(_GOLDEN))
def test_golden_digest(spark, key):
    pdf = registry.queries()[key](spark, SF_SMOKE).toPandas()
    got = hashlib.sha256(repr(canonical_rows(pdf)).encode()).hexdigest()[:16]
    assert got == _GOLDEN[key], (
        f"{key}: output changed ({got} != pinned {_GOLDEN[key]}) — if "
        f"intentional, run scripts/gen_golden.py --fix and re-front the "
        f"key (registry._RE_EARNED)"
    )
