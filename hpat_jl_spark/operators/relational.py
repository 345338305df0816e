"""The reference's relational operator surface, Spark-first.

HPAT.jl exposes exactly four table operators (reference
src/capture-api.jl): filter `t[cond]`, inner equi-`join`, `aggregate`,
and table vcat `[t1; t2]`. Each compiled to hand-written MPI C++:
  - filter  → in-place column compaction loop
              (reference src/cgen-hpat-pattern-match-table.jl:26-65)
  - join    → key%num_pes bucketing + MPI_Alltoallv + timsort + sort-merge
              (reference src/cgen-hpat-pattern-match-table.jl:139-472)
  - aggregate → local hash partial agg ("combiner") + Alltoallv + final
              hash agg (reference src/cgen-hpat-pattern-match-table.jl:535-658)
  - vcat    → per-column concatenation (reference src/capture-api.jl:146-184)

Spark's physical machinery is the same algorithm family (hash-partitioned
shuffle, SortMergeJoinExec, partial+final HashAggregateExec, union), so
these wrappers only translate the *semantics* — key renaming, output
column layout, expression-then-reduce aggregation — and leave physical
planning to Catalyst/AQE, which additionally provides what the reference
lacked: broadcast joins for small sides, spill-to-disk, skew splitting,
and whole-stage codegen.

All wrappers accept/return plain DataFrames so they compose with the full
PySpark surface (the reference's surface is closed; ours is open).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_filter(t: DataFrame, cond: Column | str) -> DataFrame:
    """`t2 = t1[cond]` — row selection over every column.

    Reference semantics (src/capture-api.jl:208-272): a boolean vector
    over columns selects rows of all columns; arithmetic/comparison ops
    in the condition are auto-vectorized. Spark: `df.filter` — Catalyst
    pushes the predicate to the Parquet scan when possible.
    """
    return t.filter(F.expr(cond) if isinstance(cond, str) else cond)


def join(
    t1: DataFrame,
    t2: DataFrame,
    left_key: str,
    right_key: str,
    out_key: str | None = None,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """`t3 = join(t1, t2, :k1==:k2, :k_out)`.

    Reference semantics (src/capture-api.jl:286-378): single equality
    key; duplicate keys on both sides produce the cross-product of
    matches; the output key column takes a new name and becomes column 1,
    followed by t1's then t2's non-key columns.

    Extensions over the reference: `how` exposes Spark's full join-type
    surface (left/right/full/semi/anti — absent in HPAT), and
    `broadcast_right=True` hints a broadcast-hash join for small
    dimension tables (the reference always shuffled both sides;
    AQE will also auto-broadcast when a side is measured small).
    """
    out_key = out_key or left_key
    right = F.broadcast(t2) if broadcast_right else t2
    joined = t1.join(right, on=t1[left_key] == t2[right_key], how=how)
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        # semi/anti joins keep only t1's columns
        cols = [t1[left_key].alias(out_key)] + [
            t1[c] for c in t1.columns if c != left_key
        ]
        return joined.select(*cols)
    cols = (
        [F.coalesce(t1[left_key], t2[right_key]).alias(out_key)]
        + [t1[c] for c in t1.columns if c != left_key]
        + [t2[c] for c in t2.columns if c != right_key]
    )
    return joined.select(*cols)


def aggregate(
    t: DataFrame,
    key: str,
    aggs: Iterable[tuple[str, Column]],
    key_alias: str | None = None,
) -> DataFrame:
    """`t2 = aggregate(t1, :key, :out = f(expr(:cols...)), ...)`.

    Reference semantics (src/capture-api.jl:387-479): each output column
    is a reduction over an element-wise expression of input columns
    (e.g. ``sum(:val2 .== 1.1)``); the grouping key may be renamed
    (`:cid = :ss_customer_sk`, src/capture-api.jl:481-493). Conditional
    sums like ``sum(:i_class_id==1)`` map to
    ``F.sum((col == 1).cast("long"))``.

    Spark executes this as partial hash aggregation before the shuffle +
    final hash aggregation after — exactly the reference's
    combiner/reducer plan — with spill support the reference lacked.
    """
    grouped = t.groupBy(F.col(key).alias(key_alias or key))
    return grouped.agg(*[col.alias(name) for name, col in aggs])


def count_unique(expr: Column | str) -> Column:
    """`length(unique(expr))` — exact per-group distinct count.

    Reference semantics (src/cgen-hpat-pattern-match-table.jl:665-684,
    844-923): local set of (key, value) pairs per destination rank,
    pairwise shuffle of sets, final per-key count. Spark's
    ``countDistinct`` runs the same expand+two-phase-agg plan. For the
    100 TB path prefer :func:`approx_count_unique` — exact distinct is a
    full shuffle of distinct pairs no matter the engine.
    """
    return F.countDistinct(expr)


def approx_count_unique(expr: Column | str, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count — the scale path the reference lacked."""
    return F.approx_count_distinct(expr, rsd)


def table_vcat(*tables: DataFrame) -> DataFrame:
    """`t4 = [t2; t3]` — UNION ALL of identically-schema'd tables.

    Reference semantics (src/capture-api.jl:146-184): schemas asserted
    equal, per-column vcat. ``unionByName`` additionally tolerates column
    order differences (matching by name, as the reference's named-column
    model implies).
    """
    if not tables:
        raise ValueError("table_vcat needs at least one table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) merge: apply an update
    snapshot to a versioned dimension. ``dim`` rows carry
    [key, attrs..., valid_from, valid_to] with NULL valid_to = current;
    ``updates`` carry [key, attrs..., ts_col].

    Per key: an update with identical attrs is a no-op; a changed
    update CLOSES the current row (valid_to = update ts) and OPENS a
    new one; an unseen key inserts its first version. History rows pass
    through untouched.

    Plan shape: one full-outer join of current rows vs updates on the
    key (historical rows never shuffle — they're unioned back as-is),
    then row construction via conditional projection; no window, no
    per-key loop. At 100 TB both sides hash-partition on the key and
    the union is append-only — the same shape a MERGE INTO compiles to
    on transactional lakehouses, minus the transaction log."""
    from functools import reduce

    hist = dim.filter(F.col(valid_to).isNotNull())
    cur = dim.filter(F.col(valid_to).isNull())
    u = updates.select(
        F.col(key).alias("__uk"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(ts_col).alias("__uts"),
    )
    j = cur.join(u, cur[key] == F.col("__uk"), "full_outer")
    same = reduce(
        lambda acc, a: acc & F.col(a).eqNullSafe(F.col(f"__u_{a}")),
        attrs,
        F.lit(True),
    )
    no_update = F.col("__uk").isNull()
    is_new_key = F.col(key).isNull()
    changed = ~no_update & ~is_new_key & ~same

    # surviving current rows: untouched or unchanged-by-update
    keep_cur = j.filter(~is_new_key & (no_update | same)).select(
        key, *attrs, valid_from, valid_to
    )
    closed = j.filter(changed).select(
        key, *attrs, valid_from, F.col("__uts").alias(valid_to)
    )
    opened = j.filter(changed | is_new_key).select(
        F.col("__uk").alias(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__uts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return hist.select(key, *attrs, valid_from, valid_to).unionByName(
        keep_cur
    ).unionByName(closed).unionByName(opened)
