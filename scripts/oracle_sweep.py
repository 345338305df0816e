#!/usr/bin/env python
"""Full local twin of the driver's correctness gate: run EVERY
registered query against its DuckDB oracle (or rows-only execute) at
sf0.01 and report failures. Exit 0 iff all green."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")  # run as scripts/oracle_sweep.py from the repo root

from hpat_jl_spark import registry
from hpat_jl_spark.session import get_spark
from hpat_jl_spark.testing import check_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="oracle-sweep")
    qs = registry.queries()
    oracles = registry.oracle_sql()
    bad = 0
    for name in qs:
        t0 = time.perf_counter()
        try:
            if name in oracles:
                issues = check_query(spark, name, sf_dir)
            else:
                n = qs[name](spark, sf_dir).count()
                issues = [] if n >= 0 else [f"negative count {n}"]
        except Exception as exc:  # noqa: BLE001
            issues = [f"raised: {exc}"]
        dt = time.perf_counter() - t0
        kind = "oracle" if name in oracles else "rows  "
        if issues:
            bad += 1
            print(f"FAIL {kind} {name} ({dt:.1f}s): {issues}")
        else:
            print(f"ok   {kind} {name} ({dt:.1f}s)")
    print(f"\n{len(qs) - bad}/{len(qs)} green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
