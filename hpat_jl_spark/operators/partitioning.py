"""Partitioning control — the reference's partitioning lattice
(reference src/HPAT.jl:67: SEQ < ONE_D_VAR < TWO_D < ONE_D; fixed-point
inference in src/distributed-pass-ast-walk.jl:34-58; user override
`@partitioned(X, HPAT_1D|HPAT_2D|HPAT_SEQ)` src/capture-api.jl:186-206)
mapped onto Spark's runtime partitioning:

  ONE_D      block rows        → a DataFrame's native partitioning
  ONE_D_VAR  variable chunks   → any post-shuffle DataFrame (the norm)
  SEQ        replicated        → broadcast(df) / collected driver value
  TWO_D      block-cyclic 2-D  → out of relational scope (Spark ML
                                 BlockMatrix; see tests/test_linalg.py
                                 for the gemm path)

The reference needed this analysis because data placement was compiled
in; Spark decides placement at runtime, so the user surface reduces to
HINTS for the three cases that matter in practice, wrapped here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_by_key(df: DataFrame, *keys: str, n: int | None = None) -> DataFrame:
    """Hash-partition on join/agg keys (the reference's `key % num_pes`
    bucketing made explicit). Pre-partitioning both sides of a repeated
    join on the same key lets Catalyst drop the second exchange."""
    return df.repartition(n, *keys) if n else df.repartition(*keys)


def partition_by_range(df: DataFrame, *cols: Column | str, n: int | None = None) -> DataFrame:
    """Range-partition (sorted block partitioning — the closest analogue
    of the reference's ONE_D over an ordered file). Gives
    min/max-prunable files when written, and sort-free windows within
    partitions."""
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


def replicate(df: DataFrame) -> DataFrame:
    """SEQ / replicated: mark a (small) frame for broadcast — every
    executor gets a full copy, as every MPI rank held SEQ arrays."""
    return F.broadcast(df)


def coalesce_small(df: DataFrame, n: int = 1) -> DataFrame:
    """Shrink partition count without a shuffle (output-file control);
    the inverse of the reference's rebalance (which equalized chunks —
    unnecessary in Spark, tasks tolerate uneven input)."""
    return df.coalesce(n)


def zorder_sort(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sort by a Z-order (Morton) curve over ``cols`` — the multi-
    dimensional clustering layout: after writing the sorted frame to
    Parquet, BOTH columns' min/max footer ranges are narrow per file,
    so selective filters on EITHER column prune files (a single-column
    sort only prunes its own column).

    Each column is rank-normalized to [0, 2^bits) using approxQuantile
    boundaries + Bucketizer — a SAMPLED sketch plus a map-side bin
    lookup, never a global sort of the raw data (an ntile/percent_rank
    formulation would funnel every row through one task). The ranks are
    bit-interleaved into one long with JVM shift/or expressions (no
    UDF); the only ordered operation is the final range repartition by
    the Morton key, which is exactly the write-side clustering shuffle.
    At 100 TB this is the layout step before handing data to any
    range-pruning reader."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    ranked = df
    rank_cols = []
    for c in cols:
        splits = df.stat.approxQuantile(c, probs, 1.0 / (4 * n_buckets))
        # dedupe + guard: approx boundaries can repeat on skewed data
        uniq = sorted(set(splits))
        all_splits = [float("-inf")] + uniq + [float("inf")]
        rc = f"__r_{c}"
        ranked = Bucketizer(
            splits=all_splits, inputCol=c, outputCol=rc, handleInvalid="keep"
        ).transform(ranked)
        ranked = ranked.withColumn(rc, F.col(rc).cast("int"))
        rank_cols.append(rc)
    eff_bits = bits
    z = F.lit(0).cast("long")
    for b in range(eff_bits):
        for i, rc in enumerate(rank_cols):
            bit = F.shiftright(F.col(rc), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * len(cols) + i))
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        ranked.withColumn("__z", z)
        .repartitionByRange(n_parts, "__z")
        .sortWithinPartitions("__z")
        .drop(*rank_cols, "__z")
    )
