"""As-of (most-recent-prior) join and banded range join — custom
operators Spark's join surface lacks (and the reference lacked too;
SURVEY §2.3 'Not present: theta/range/as-of joins'). Both are built as
compositions of existing DataFrame ops (no UDFs), per the
composition-first custom-operator policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on within the same ``by`` group (pandas
    merge_asof / DuckDB ASOF JOIN semantics, backward direction,
    inclusive). Unmatched left rows keep nulls (left-join semantics).

    Physical shape — the 100 TB-safe one: NO per-row range probe and no
    broadcast of the right side. Both sides are unioned, shuffled once
    on ``by``, sorted within partition by the time key, and matched
    with a running last_value(ignorenulls) window — one shuffle, linear
    scan, identical to a distributed merge-asof. Skewed ``by`` keys are
    the hazard (same mitigation as any window: pre-split hot keys).

    ``on`` must be a TimestampType/numeric column; ties between a left
    and right row at the same instant match (inclusive).
    """
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != by],
        F.col(by),
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(on).alias("__r_on"),
    ).select(
        *lcols, "__t", "__is_left",
        *[f"__r_{c}" for c in right_value_cols], "__r_on",
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at the same timestamp → inclusive
    w = (
        Window.partitionBy(by)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_value_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias("__m_on"),
    ).drop("__t")
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left")
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("__m_on"))
        ) <= int(tolerance_seconds * 1_000_000)
        for c in right_value_cols:
            out = out.withColumn(
                f"__m_{c}", F.when(in_tol, F.col(f"__m_{c}"))
            )
        out = out.withColumn("__m_on", F.when(in_tol, F.col("__m_on")))
    renames = {f"__m_{c}": f"right_{c}" for c in right_value_cols}
    renames["__m_on"] = f"right_{on}"
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    band_width: float,
    how_cond: Column | None = None,
) -> DataFrame:
    """Range join |left_val - right_val| <= band_width via banding:
    each side is bucketed to floor(val/band); left rows replicate into
    their own and both neighbor buckets, so every qualifying pair meets
    in exactly the equi-join on bucket id — a hash-partitioned shuffle
    instead of a cross product (the classic interval-join blocking
    scheme; at 100 TB the bucket key is the shuffle key and skew follows
    the value distribution).

    Returns the joined frame (all left + all right columns); apply
    further predicates via ``how_cond``.
    """
    lb = left.withColumn(
        "__band",
        F.explode(
            F.array(
                (F.floor(F.col(left_val) / band_width) - 1).cast("long"),
                F.floor(F.col(left_val) / band_width).cast("long"),
                (F.floor(F.col(left_val) / band_width) + 1).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__band", F.floor(F.col(right_val) / band_width).cast("long")
    )
    cond = (F.col(f"l.{left_val}") - F.col(f"r.{right_val}") <= band_width) & (
        F.col(f"r.{right_val}") - F.col(f"l.{left_val}") <= band_width
    )
    if how_cond is not None:
        cond = cond & how_cond
    return (
        lb.alias("l")
        .join(rb.alias("r"), F.col("l.__band") == F.col("r.__band"))
        .filter(cond)
        .drop("__band")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    extra_cond: Column | None = None,
    dedup_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """All (left, right) pairs whose [start, end] intervals OVERLAP —
    without a cross join. Each interval explodes into the fixed-width
    buckets it spans; overlapping intervals necessarily share at least
    one bucket, so the candidate set is an equi-join on bucket id,
    deduplicated and verified with the exact overlap predicate.

    Dedup contract (ADVICE r01): bucket replication makes a pair appear
    once per shared bucket, so duplicates must be collapsed. Pass
    ``dedup_cols`` naming the pair identity (id columns from both
    sides) to dedup on it explicitly. When None, the dedup falls back
    to ALL columns — correct ONLY if each input's rows are unique as
    tuples; two fully identical left rows would collapse into one pair
    per right match instead of two.

    Scale: the shuffle key is the bucket id; work scales with
    Σ interval_span/bucket_width per row, so pick bucket_width near the
    TYPICAL interval length (too small → replication blow-up for long
    intervals; too large → fat buckets → near-cross-join within a
    bucket). A long-interval outlier is the skew hazard — clamp or
    split outliers upstream. ``extra_cond`` (e.g. different-user) is
    applied before dedup to cut the pair stream early."""
    lb = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / bucket_width),
                F.floor(F.col(left_end) / bucket_width),
            )
        ),
    )
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bucket_width),
                F.floor(F.col(right_end) / bucket_width),
            )
        ),
    )
    pairs = lb.join(rb, "__bkt").filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
    )
    if extra_cond is not None:
        pairs = pairs.filter(extra_cond)
    pairs = pairs.drop("__bkt")
    if dedup_cols is not None:
        return pairs.dropDuplicates(list(dedup_cols))
    return pairs.dropDuplicates()
