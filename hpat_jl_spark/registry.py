"""Query registry — the single source of truth wiring each implemented
operator/query to (a) its PySpark plan and (b) its DuckDB oracle SQL.

The driver contract (__spark_entry__.py) needs ``queries()`` and
``oracle_sql()`` dicts; plan modules register here so the two stay in
sync by construction. Column names must match between the Spark plan and
the oracle (the harness sorts columns by name before value-hashing), so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Columns exempt from the exact float compare (VERDICT r08 #2):
    # raw unquantized floats whose cross-engine agreement is genuinely
    # tolerance-bounded (order-dependent float math that cannot be
    # fixed-point quantized without changing the query's semantics).
    # Every entry is a documented driver-hash RISK — the gate hashes
    # exact values — so prefer quantizing the plan over tagging it.
    float_tol: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    float_tol: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query plan."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, float_tol=float_tol
        )
        return fn

    return deco


# Driver-gate ordering. The correctness driver consumes ``queries()`` in
# dict order and records rows for roughly the first 50 entries per round,
# so dict order IS the driver-evidence window.
#
# Rotation policy (VERDICT r07 #2 — the window had ossified on ~50 of
# 186, leaving 136 queries without a fresh driver-side row since r1-r4):
#   1. DRIVER_PRIORITY (below) leads — ONLY the plans whose physical
#      strategy or semantics changed THIS round, so changes always
#      re-earn a driver row first. Reset it each round; history lives
#      in git, not in the list.
#   2. Everything else follows ordered by the OLDEST last-driver-green
#      round, computed at import time from the committed
#      CORRECTNESS_r*.json artifacts at the repo root (ties broken by
#      registration order, which is stable). A query the driver has
#      never recorded sorts first of all.
# Net effect: each round's ~50-row window = (changed plans) + (the
# longest-unrefreshed queries), so every registered query re-earns a
# driver-side CORRECTNESS row every ~3-4 rounds. If no CORRECTNESS
# artifacts are readable (fresh clone, driver sandbox), the order
# degrades to DRIVER_PRIORITY + registration order — the pre-r8
# behavior. Names not (yet) registered are skipped, so new plans can
# be pre-listed.
DRIVER_PRIORITY: list[str] = [
    # r13 changed plans (VERDICT r12 #2): the three r6-era
    # unconditional round-robin raw-text pins converted to the
    # conditional starved-scan policy (hash pin by doc_id when the
    # scan is split-starved, NO exchange on split-rich input) — each
    # must re-earn a driver row under the vanilla session.
    "heavy_hitters",
    "tfidf_top_terms",
    "inverted_index",
    "text_stats",
    # r13: split-count input swapped to session.scan_split_count
    # (job-free, row-group-capped) — same decisions on the fixtures
    # (test-pinned) but the physical-strategy input changed.
    "benchmark_decontaminate",
    "duplicate_span_report",
    # r13: minhash/simhash signature fanout now byte-sized (r9 rule);
    # width unchanged at sf0.1 but the plan code changed.
    "dedup_minhash",
    "dedup_simhash",
    "fuzzy_decontaminate",
    # r13: merged fit+query collect (one action; final plans unchanged)
    "knn_ivf_portable",
    "knn_ivf_persisted",
]


def _driver_round_history(root: str | None = None) -> dict[str, int]:
    """name -> last round with a driver CORRECTNESS row (0 if never),
    read from CORRECTNESS_r*.json at the repo root. Best-effort: any
    unreadable file is skipped; an empty result disables rotation.
    ``root`` is injectable for tests; None uses the repo root."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered_names() -> list[str]:
    """Registry names: this round's DRIVER_PRIORITY first (deduped,
    first occurrence wins), then the rest rotated oldest-driver-round
    first (see the rotation policy above)."""
    seen: set[str] = set()
    prio = []
    for n in DRIVER_PRIORITY:
        if n in REGISTRY and n not in seen:
            seen.add(n)
            prio.append(n)
    rest = [n for n in REGISTRY if n not in seen]
    last = _driver_round_history()
    if last:
        order = {n: i for i, n in enumerate(REGISTRY)}
        rest.sort(key=lambda n: (last.get(n, 0), order[n]))
    return prio + rest


def load_all_plans() -> None:
    """Import every plan module for side-effect registration."""
    import hpat_jl_spark.plans.relational_core  # noqa: F401
    import hpat_jl_spark.plans.bigbench  # noqa: F401
    import hpat_jl_spark.plans.tpch  # noqa: F401
    import hpat_jl_spark.plans.tpch_joins  # noqa: F401
    import hpat_jl_spark.plans.tpch_subqueries  # noqa: F401
    import hpat_jl_spark.plans.tpch_partsupp  # noqa: F401
    import hpat_jl_spark.plans.windowed  # noqa: F401
    import hpat_jl_spark.plans.text_pipeline  # noqa: F401
    import hpat_jl_spark.plans.similarity  # noqa: F401
    import hpat_jl_spark.plans.extended  # noqa: F401
    import hpat_jl_spark.plans.ml_kernels  # noqa: F401
    import hpat_jl_spark.plans.temporal  # noqa: F401
    import hpat_jl_spark.plans.scalar_surface  # noqa: F401
    import hpat_jl_spark.plans.llm_pipeline  # noqa: F401
    import hpat_jl_spark.plans.graph  # noqa: F401
    import hpat_jl_spark.plans.streaming  # noqa: F401
    import hpat_jl_spark.plans.hdf5_source  # noqa: F401


def queries() -> dict[str, QueryFn]:
    load_all_plans()
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    load_all_plans()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
