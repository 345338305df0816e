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


def queries() -> dict[str, QueryFn]:
    load_all_plans()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_plans()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
