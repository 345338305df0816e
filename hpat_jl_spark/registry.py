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


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query plan."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


# Driver-gate ordering. The correctness driver consumes ``queries()`` in
# dict order and records rows for roughly the first 50 entries per round.
# Names listed here are emitted FIRST (in this order); everything else
# follows in registration order. Round 3 policy (VERDICT r02 #3): the four
# queries broken by the µs-fixture regeneration lead (re-verification of
# the fix), then every query with no CORRECTNESS_r01/r02 driver row —
# oracle-checked ahead of rows-only (the rows-only check is weaker, so
# missing the window costs less) — so r01∪r02∪r03 covers all 142.
# Names not (yet) registered are skipped, so new plans can be pre-listed.
DRIVER_PRIORITY: list[str] = [
    # Fixed this round: µs/TIMESTAMP_NTZ fixture breakage (VERDICT r02 #1).
    "asof_join_views",
    "range_frame_window",
    "sessionize_events",
    "stream_tumbling_counts",
    # Upgraded rows-only → oracle this round (VERDICT r02 #7): their r02
    # rows are the weaker no_oracle kind, so re-gate with the new twins.
    "ml_naive_bayes_lang",
    "ml_logreg_purchase",
    "checkpointed_pagerank",
    # New this round (no prior rows by definition).
    "lang_id_ngram",
    "udtf_document_chunks",
    "asof_join_tolerance",
    "connected_components_repeat_pairs",
    "sax_similarity_candidates",
    "ks_test_purchase_view",
    "js_divergence_sources",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_stream_join_purchases",
    "stream_dedup_events",
    "stream_running_user_totals",
    "stream_static_enrichment",
    # Oracle-checked queries with no r01/r02 driver row.
    "latest_record_compaction",
    "null_safe_join",
    "incremental_daily_counts",
    "embedding_scale_report",
    "activity_streaks",
    "explode_tokens",
    "json_struct_agg",
    "map_functions_surface",
    "approx_percentiles_sketch",
    "equidepth_binning",
    "benchmark_decontaminate",
    "pii_scrub",
    "heavy_hitters",
    "tfidf_top_terms",
    "inverted_index",
    "tokenize_to_ids",
    "sequence_packing",
    "domain_mix_report",
    "corpus_prep_pipeline",
    "fuzzy_name_pairs",
    "weighted_sample_docs",
    "unigram_logprob_quality",
    "cms_heavy_hitters",
    "c4_line_filter",
    "paragraph_dedup",
    "triangle_count",
    "clustering_coefficient",
    "link_prediction_customers",
    "pagerank_trade_graph",
    # Rows-only queries with no r01/r02 driver row (weaker check; tail of
    # the window). The most design-critical lead.
    "dedup_minhash",
    "dedup_simhash",
    "knn_ivf",
    "knn_pq",
    "knn_lsh",
    "dedup_cluster",
    "quality_model_filter",
    "approx_distinct",
    "stratified_sample_sources",
    "ml_kmeans_clusters",
    "multimodal_features",
    "monte_carlo_pi",
]


def _ordered_names() -> list[str]:
    """Registry names with DRIVER_PRIORITY entries first."""
    prio = [n for n in DRIVER_PRIORITY if n in REGISTRY]
    seen = set(prio)
    return prio + [n for n in REGISTRY if n not in seen]


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
