#!/usr/bin/env python
"""Gate-liveness audit: flag oracles whose result set goes NON-EMPTY →
EMPTY between fixture scales (the q11 vacuity class, VERDICT r08 #3:
a fixed threshold over 1/SF-scaling data returns rows at the gate
scale but 0 at bench scale, so all larger-scale evidence for that
query shape is trivially green).

DuckDB-only (each registered oracle runs at sf0.01 and sf0.1; row
counts compared), so it is cheap and needs no Spark session — run it
whenever a plan's filter threshold changes. Queries that are empty at
EVERY scale by design (e.g. except_keys) are not flagged: the signal
is specifically the >0 → 0 transition. Exit 1 if any query flips.

r9 findings (both fixed the same round): q11_important_stock
(fraction now 60/count(lineitem)) and inverted_index (df cap now
greatest(100, n_docs/20)).

    python scripts/liveness_audit.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hpat_jl_spark import registry  # noqa: E402
from hpat_jl_spark.testing import duckdb_con  # noqa: E402

SCALES = ("0.01", "0.1")


def main() -> int:
    registry.load_all_plans()
    oracles = registry.oracle_sql()
    cons = {sf: duckdb_con(f"/root/testdata/sf{sf}") for sf in SCALES}
    flagged: list[str] = []
    for name, sql in oracles.items():
        counts: dict[str, int] = {}
        try:
            for sf, con in cons.items():
                counts[sf] = len(con.execute(sql).fetchall())
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {str(exc)[:100]}", flush=True)
            flagged.append(f"{name}: oracle raised")
            continue
        lo, hi = counts[SCALES[0]], counts[SCALES[1]]
        if lo > 0 and hi == 0:
            line = f"{name}: {lo} rows at sf{SCALES[0]} but 0 at sf{SCALES[1]}"
            flagged.append(line)
            print(f"VACUOUS {line}", flush=True)
        else:
            print(f"ok   {name} ({lo} -> {hi})", flush=True)
    print(f"\n{len(oracles) - len(flagged)}/{len(oracles)} live")
    for line in flagged:
        print(f"  {line}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
