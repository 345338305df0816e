"""Skew-mitigation utilities for hot keys — the 100 TB discipline layer.

The reference rebalanced only for DAAL's equal-chunk requirement
(reference src/distributed-pass.jl:1280-1334 __hpat_arr_rebalance,
pairwise Isend/Irecv); it had NO answer to key skew in join/aggregate
shuffles (a hot key lands on one rank and that rank becomes the job).
Spark's AQE skew-join splitting handles the join case automatically
(enabled in session.py); these helpers cover the cases AQE doesn't:
skewed AGGREGATIONS (two-phase salted aggregate) and joins against a
broadcastable-but-not-broadcast dimension under extreme key skew
(salted replicate join).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    partial_aggs: Iterable[tuple[str, Column]],
    final_aggs: Iterable[tuple[str, Column]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with salt: groupBy(key, salt) computes
    partials (splitting a hot key across ``salt_buckets`` reducers),
    then groupBy(key) merges. Only algebraic aggregates decompose this
    way — the caller supplies both phases explicitly:

        salted_aggregate(df, "k",
            partial_aggs=[("s", F.sum("v")), ("c", F.count(F.lit(1)))],
            final_aggs=[("total", F.sum("s")), ("n", F.sum("c"))])

    (For most workloads Spark's own partial aggregation already bounds
    skew — use this only when the FINAL aggregate's reducer for one key
    is the measured bottleneck, e.g. exact count-distinct on a hot key.)
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                         F.lit(salt_buckets))
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs]
    )
    return partial.groupBy(key).agg(*[c.alias(n) for n, c in final_aggs])


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    skewed_key: str,
    small_key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Join a skewed fact against a small-but-not-tiny dimension by
    salting: fact rows get a random salt in [0, B); the dimension is
    replicated B× with every salt value; the join key becomes
    (key, salt) so one hot key spreads over B reducers.

    Prefer broadcast / AQE skew-join when applicable — this is the
    manual fallback for when the dimension exceeds the broadcast
    threshold AND one fact key dominates. Inner join only.
    """
    salted_fact = skewed.withColumn(
        "__salt",
        F.pmod(
            F.spark_partition_id() + F.monotonically_increasing_id(),
            F.lit(salt_buckets),
        ).cast("int"),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(
        replicated,
        (salted_fact[skewed_key] == replicated[small_key])
        & (salted_fact["__salt"] == replicated["__salt"]),
        "inner",
    )
    return out.drop("__salt")
