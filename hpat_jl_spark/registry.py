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
# follows in registration order. Round 4 policy (VERDICT r03 #1): the 11
# queries never driver-checked in r1-r3 lead, headed by dedup_minhash /
# dedup_cluster, which upgraded from rows-only to a full DuckDB twin of
# the portable-hash MinHash pipeline this round. Then the queries whose
# plans or oracles changed this round (re-verification of the change),
# then the rest of the registry in registration order (all have a green
# r1-r3 row; extra windows re-confirm them).
# Names not (yet) registered are skipped, so new plans can be pre-listed.
DRIVER_PRIORITY: list[str] = [
    # Upgraded rows-only → full oracle this round (VERDICT r03 #1/#3):
    # MinHash+LSH candidate set + transitive clusters, exact DuckDB twin.
    "dedup_minhash",
    "dedup_cluster",
    # Never driver-checked in r1-r3 (the remaining rows-only queries).
    "dedup_simhash",
    "knn_lsh",
    "knn_ivf",
    "knn_pq",
    "ml_kmeans_clusters",
    "multimodal_features",
    "quality_model_filter",
    "stratified_sample_sources",
    "approx_distinct",
    "monte_carlo_pi",
    # Plans touched this round — re-verify under the driver gate:
    # tokenize_to_ids (vocab-rank window rewritten for scale, VERDICT #2),
    # sequence_packing (chunked prefix-sum wiring, VERDICT #4),
    # sax_similarity_candidates (floor-div/zero-pad hardening, ADVICE).
    "tokenize_to_ids",
    "sequence_packing",
    "sax_similarity_candidates",
    "corpus_prep_pipeline",
    # New this round: HDF5 source parity (VERDICT r03 #6) and the
    # oracle-gated slice of the de-stubbed multimodal header decode.
    "hdf5_ingest_agg",
    "multimodal_header_recovery",
    "quasi_monte_carlo_pi",
    "embedding_dedup_clusters",
    "bpe_train_merges",
    "bpe_encode_stats",
    "duplicate_span_report",
    "stream_foreach_batch_upsert",
    "incremental_dedup_ingest",
    # Round-4 session 2: new gated sketch/sampling surfaces (the
    # knn_lsh and hdf5_ingest_agg upgrades are already listed above).
    "hll_distinct_portable",
    "stratified_sample_hash",
    "kmeans_lloyd_exact",
    "knn_ivf_portable",
    "knn_pq_portable",
    "quality_model_coefs",
    "bpe_encode_fixed",
    "fuzzy_decontaminate",
    "mix_rebalance_plan",
    "csv_ingest_agg",
    "json_ingest_agg",
    "orc_ingest_agg",
    "lines_ingest_agg",
    "compaction_roundtrip_agg",
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
