#!/usr/bin/env python
"""Registry count generator (VERDICT r02 #6: docs drifted from the live
registry because counts were hand-synced). Prints the live counts and,
with --fix, rewrites every "N queries" mention in README.md /
COVERAGE.md from the live registry so the documented numbers are
generated, not typed (tests/test_contract.py pins them).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_with_mapreduce_cuda_spark import registry


def main() -> int:
    qs = registry.queries()
    os_ = registry.oracle_sql()
    n, n_oracle = len(qs), len(os_)
    print(f"queries={n} oracle={n_oracle} rows_only={n - n_oracle}")
    if "--fix" not in sys.argv:
        return 0
    for path in ("README.md", "COVERAGE.md"):
        if not os.path.exists(path):
            continue
        text = open(path).read()
        fixed = re.sub(
            r"\b\d{3,} queries\b", f"{n} queries", text
        )
        # prose sweep notes like "366/366 ok" drift too (VERDICT r03 #7).
        # Only rewrite n/n pairs that already match each other (ADVICE
        # r04): a recorded partial result like "365/366 ok" must never
        # be promoted to a claim of full success.
        fixed = re.sub(r"\b(\d{3,})/\1 ok\b", f"{n}/{n} ok", fixed)
        if fixed != text:
            open(path, "w").write(fixed)
            print(f"updated {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
