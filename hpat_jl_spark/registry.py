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
    # r10 changed plans first: the session-scoped workdir rewrite
    # (VERDICT r09 #1) touched these two, csv_roundtrip_sink is
    # new (VERDICT r09 #7 — the TXT sink's first registered gate),
    # clustering_coefficient's corner attribution is one-pass now
    # (g×100 disk exhaustion fix), and fuzzy_decontaminate gained the
    # persisted narrow banded stream (×100 profile, VERDICT r09 #6).
    "checkpointed_pagerank",
    "knn_ivf_persisted",
    "csv_roundtrip_sink",
    "clustering_coefficient",
    "fuzzy_decontaminate",
    # VERDICT r09 #2: the 41 queries with no driver row in ANY r6-r9
    # window (CORRECTNESS_r0{6..9}.json ∖ registry, computed and
    # pinned by tests/test_registry_rotation.py). With these in the
    # r10 window, cumulative r6-r10 driver evidence covers 186/186.
    "filter_select",
    "project_rename",
    "derived_column",
    "join_dup_keys",
    "join_left_outer",
    "join_semi_anti",
    "agg_sum_count_max",
    "agg_conditional",
    "count_distinct_agg",
    "union_all_vcat",
    "not_null_filter",
    "asof_join_views",
    "asof_join_tolerance",
    "activity_streaks",
    "sax_similarity_candidates",
    "explode_tokens",
    "json_struct_agg",
    "map_functions_surface",
    "approx_percentiles_sketch",
    "equidepth_binning",
    "pii_scrub",
    "heavy_hitters",
    "tfidf_top_terms",
    "domain_mix_report",
    "fuzzy_name_pairs",
    "weighted_sample_docs",
    "unigram_logprob_quality",
    "cms_heavy_hitters",
    "c4_line_filter",
    "paragraph_dedup",
    "js_divergence_sources",
    "connected_components_repeat_pairs",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_stream_join_purchases",
    "stream_dedup_events",
    "stream_running_user_totals",
    "stream_static_enrichment",
    "lines_ingest_agg",
    "compaction_roundtrip_agg",
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
