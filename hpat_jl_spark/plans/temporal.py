"""Temporal join plans: as-of join (oracle: DuckDB's native ASOF JOIN)
and banded range join (oracle: plain inequality join — exact same pair
set, different physical strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.operators.asof import asof_join, banded_range_join
from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table

_asof_oracle = """
SELECT p.event_id,
       p.user_id,
       round(p.value, 2) AS purchase_value,
       round(v.value, 2) AS last_view_value,
       round((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 3) AS secs_since_view
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register("asof_join_views", oracle=_asof_oracle, tags=("temporal",))
def asof_join_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior view —
    merge-asof via single shuffle + running last_value window
    (operators/asof.py), checked against DuckDB's native ASOF JOIN."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase")
    views = events.filter(F.col("event_type") == "view")
    j = asof_join(purchases, views, on="ts", by="user_id",
                  right_value_cols=["value"])
    return j.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("right_value", 2).alias("last_view_value"),
        F.round(
            (F.unix_micros("ts") - F.unix_micros("right_ts")) / 1_000_000.0, 3
        ).alias("secs_since_view"),
    )


_q03_oracle = """
SELECT p.event_id, p.user_id,
       count(v.v_ts) AS views_before,
       round(coalesce(sum(v.v_value), 0.0), 2) AS viewed_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id AS v_user, ts AS v_ts, value AS v_value
           FROM events WHERE event_type = 'view') v
  ON p.user_id = v.v_user
 AND v.v_ts <= p.ts
 AND v.v_ts >= p.ts - INTERVAL 24 HOURS
GROUP BY p.event_id, p.user_id
"""


@register("q03_views_before_purchase", oracle=_q03_oracle, tags=("temporal", "bigbench"))
def q03_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BigBench Q03 analogue (reference examples/queries_devel/q03.jl,
    designed-only: items viewed in the session before each purchase):
    per purchase, the count and value of the user's views in the
    preceding 24 h — a batch time-range join (the streaming twin is
    streaming/windows.stream_stream_purchase_after_view).

    Scale: the join shuffles both sides once on user_id; the range
    predicate bounds the per-user pair fan-out by the 24 h window."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    j = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("ts"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS")),
        "left",
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("v_ts").alias("views_before"),
        F.round(F.coalesce(F.sum("v_value"), F.lit(0.0)), 2).alias("viewed_value"),
    )


_range_oracle = """
SELECT s.s_suppkey, c.c_custkey,
       round(s.s_acctbal - c.c_acctbal, 2) AS bal_gap
FROM supplier s JOIN customer c
  ON abs(s.s_acctbal - c.c_acctbal) <= 100.0
"""


@register("range_join_balance", oracle=_range_oracle, tags=("temporal",))
def range_join_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|s_acctbal - c_acctbal| <= 100 pairs via the banded range join
    (bucket equi-join + neighbor replication) — the pair set must equal
    the naive theta join the oracle runs."""
    supplier = load_table(spark, "supplier", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    j = banded_range_join(
        supplier.select("s_suppkey", "s_acctbal"),
        customer.select("c_custkey", "c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        band_width=100.0,
    )
    return j.select(
        "s_suppkey",
        "c_custkey",
        F.round(F.col("s_acctbal") - F.col("c_acctbal"), 2).alias("bal_gap"),
    )
