#!/usr/bin/env python
"""Gate-liveness audit: flag oracles whose result set goes NON-EMPTY →
EMPTY between fixture scales (the q11 vacuity class, VERDICT r08 #3:
a fixed threshold over 1/SF-scaling data returns rows at the gate
scale but 0 at bench scale, so all larger-scale evidence for that
query shape is trivially green).

DuckDB-only (each registered oracle runs at every scale in each pair;
row counts compared), so it is cheap and needs no Spark session — run
it whenever a plan's filter threshold changes. Queries that are empty
at EVERY scale by design (e.g. except_keys) are not flagged: the
signal is specifically the >0 → 0 transition. Exit 1 if any query
flips at any audited pair.

Audited pairs (VERDICT r09 #8 — a threshold can go vacuous only ABOVE
bench scale, where a future probe would silently inherit it):

  * sf0.01 ↔ sf0.1 (always)
  * sf0.1 ↔ ×10 tier (when scripts/scaling_probe.py's staged amplified
    parquet is present — DuckDB reads the Spark-written part files
    directly)

r9 findings (both fixed the same round): q11_important_stock
(fraction now 60/count(lineitem)) and inverted_index (df cap now
greatest(100, n_docs/20)).

    python scripts/liveness_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from hpat_jl_spark import registry  # noqa: E402
from hpat_jl_spark.testing import duckdb_con  # noqa: E402

X10_DIR = "/tmp/spark_graft_tier_x10"


# Per-oracle wall budget per side. The audit's question is "did this
# gate go vacuous", not "is DuckDB fast" — but one pathological oracle
# (fuzzy_name_pairs' FastSS twin is ~quadratic in DuckDB at the ×10
# tier) hung the r10 run for 25+ minutes with no output. A timed-out
# oracle is reported SLOW and skipped, never flagged: an oracle that
# RUNS this long cannot be silently vacuous in the driver gate (the
# sweep would time out loudly too), and the audit keeps its coverage
# of the other ~185.
ORACLE_TIMEOUT_S = float(os.environ.get("LIVENESS_ORACLE_TIMEOUT_S", "120"))
SLOW: list[str] = []


def _count_rows(con, sql: str, _retried: bool = False) -> int | None:
    """Row count with a watchdog: duckdb's interrupt() aborts the
    running query from another thread; None means timed out.

    Race guard (ADVICE r10): if the query finishes right at the
    deadline, interrupt() can fire AFTER fetchall() returned but before
    done.set(), leaving a stale interrupt on the shared connection that
    aborts the NEXT query. The watchdog therefore records intent in
    ``timed_out`` BEFORE interrupting, and an INTERRUPT surfacing with
    the flag unset (the stale case) is retried once on the same
    connection instead of being classified."""
    import threading

    done = threading.Event()
    timed_out = threading.Event()

    def _watchdog():
        if not done.wait(ORACLE_TIMEOUT_S):
            timed_out.set()
            con.interrupt()

    t = threading.Thread(target=_watchdog, daemon=True)
    t.start()
    try:
        return len(con.execute(sql).fetchall())
    except Exception as exc:  # noqa: BLE001
        if "INTERRUPT" in str(exc).upper():
            if timed_out.is_set():
                return None
            if not _retried:  # stale interrupt from a prior watchdog
                done.set()
                t.join()
                return _count_rows(con, sql, _retried=True)
        raise
    finally:
        done.set()
        t.join()


def _audit_pair(
    oracles: dict[str, str], lo_label: str, lo_dir: str,
    hi_label: str, hi_dir: str,
) -> list[str]:
    print(f"\n== pair {lo_label} -> {hi_label} ==", flush=True)
    con_lo = duckdb_con(lo_dir)
    con_hi = duckdb_con(hi_dir)
    flagged: list[str] = []
    for name, sql in oracles.items():
        try:
            lo = _count_rows(con_lo, sql)
            hi = _count_rows(con_hi, sql) if lo is not None else None
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {str(exc)[:100]}", flush=True)
            flagged.append(f"{name}: oracle raised at {lo_label}/{hi_label}")
            continue
        if lo is None or hi is None:
            SLOW.append(f"{name} @ {lo_label}->{hi_label}")
            print(f"SLOW {name}: > {ORACLE_TIMEOUT_S:.0f}s per side — "
                  "skipped (not a liveness signal)", flush=True)
        elif lo > 0 and hi == 0:
            line = f"{name}: {lo} rows at {lo_label} but 0 at {hi_label}"
            flagged.append(line)
            print(f"VACUOUS {line}", flush=True)
        else:
            print(f"ok   {name} ({lo} -> {hi})", flush=True)
    return flagged


def main() -> int:
    registry.load_all_plans()
    oracles = registry.oracle_sql()
    flagged = _audit_pair(
        oracles, "sf0.01", "/root/testdata/sf0.01",
        "sf0.1", "/root/testdata/sf0.1",
    )
    n_pairs = 1
    if os.path.isfile(os.path.join(X10_DIR, ".staged")):
        flagged += _audit_pair(
            oracles, "sf0.1", "/root/testdata/sf0.1", "x10", X10_DIR
        )
        n_pairs += 1
    else:
        print(
            f"\n# ×10 tier not staged at {X10_DIR} — second pair skipped "
            "(run scripts/scaling_probe.py to stage it)",
            flush=True,
        )
    total = len(oracles) * n_pairs
    print(
        f"\n{total - len(flagged) - len(SLOW)}/{total} live checks across "
        f"{n_pairs} pair(s); {len(SLOW)} skipped as slow "
        f"(> {ORACLE_TIMEOUT_S:.0f}s/side)"
    )
    for line in SLOW:
        print(f"  SLOW {line}")
    for line in flagged:
        print(f"  {line}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
