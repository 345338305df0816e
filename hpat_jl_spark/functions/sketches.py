"""Mergeable frequency sketches, expressed as plain DataFrame plans.

Extension layer (the reference's aggregation story stops at exact
hash-aggs, SURVEY §2.4; approx_count_unique covers distincts). The
count-min sketch (Cormode & Muthukrishnan 2005) is the workhorse for
approximate per-item counts when the key cardinality itself is the
scale problem: the sketch is a fixed depth×width counter grid, so the
final state is O(d·w) REGARDLESS of corpus size, and partial
aggregation merges per-partition sketches for free — exactly the
mergeability property that makes it work on a 1000-executor cluster.

Everything is JVM-side: bucketing is xxhash64 + pmod, the grid is one
hash-agg. No Python anywhere, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_cells(df: DataFrame, col: str, depth: int, width: int, seed: int):
    """(value, d, bucket) rows: each value explodes to its ``depth``
    cells, bucket = pmod(xxhash64(value, seed + d), width). pmod (not
    %) — xxhash64 is signed; no arithmetic ON the hash value, so ANSI
    overflow can't trigger. Seeding the hash with d makes the rows
    pairwise-independent hash functions of each other."""
    ds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    return df.select(F.col(col), ds).select(
        col,
        "d",
        F.pmod(
            F.xxhash64(F.col(col), F.col("d") + F.lit(seed)), F.lit(width)
        ).alias("bucket"),
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 17,
) -> DataFrame:
    """Build a count-min sketch over ``df[col]`` as a (d, bucket, cnt)
    DataFrame of at most depth×width rows.

    Plan: each input row explodes to ``depth`` (d, bucket) rows — a
    fixed small constant fan-out — then ONE partial+final hash-agg
    counts per cell. Map-side combine means each partition ships at
    most d·w cells to the shuffle no matter how many rows it scanned:
    the sketch "merge" IS Spark's partial aggregation. Persist/reuse
    the result to answer any number of point queries without
    rescanning the corpus."""
    return (
        _probe_cells(df, col, depth, width, seed)
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 17,
) -> DataFrame:
    """Point-estimate counts for ``items[col]`` against a sketch built
    with the same (depth, width, seed): est = min over rows d of the
    cell count — the classic one-sided estimate (never an
    underestimate; overestimates only on collisions).

    Plan: items explode to their depth probe cells, equi-join the
    sketch on (d, bucket) — the sketch side is d·w rows, broadcast-
    sized by construction — then a min per item. Missing cells mean
    count 0."""
    ds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probes = items.select(F.col(col), ds).select(
        col,
        "d",
        F.pmod(F.xxhash64(F.col(col), F.col("d") + F.lit(seed)), F.lit(width)).alias(
            "bucket"
        ),
    )
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est_count")
    )
