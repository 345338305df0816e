"""One registered query per reference golden test (SURVEY §5 table):
filter, projection/rename, derived column, joins (incl. the duplicate-key
semantics of reference test/join_test1.jl and the new left/semi/anti
surface), aggregates (plain, conditional, count-distinct, key-rename),
vcat/UNION ALL, not-null, distinct/intersect/except, global reductions.

Each runs on the fixture star schema; the oracle SQL is the registered
twin. These are deliberately small plans — the point is operator-level
parity with the reference, checked value-by-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.operators.relational import (
    aggregate,
    join,
    table_filter,
    table_vcat,
)
from hpat_jl_spark.operators.setops import distinct_rows, except_rows, intersect
from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table


@register(
    "filter_select",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_totalprice > 150000.0
""",
    tags=("core",),
)
def filter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t2 = t1[:c > x]` + column projection (reference
    test/filter_test1.jl:13-37; src/capture-api.jl:208-272). The
    predicate and the 3-column projection must both reach the Parquet
    scan (PushedFilters + ReadSchema) — asserted in tests/test_plans.py.
    """
    orders = load_table(spark, "orders", sf_dir)
    return table_filter(orders, F.col("o_totalprice") > 150000.0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "project_rename",
    oracle="""
SELECT c_custkey AS cid, c_acctbal AS balance, c_mktsegment AS segment
FROM customer
""",
    tags=("core",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column rename (reference src/capture-api.jl:481-493 key-rename;
    designed `table[:new=:old]` forms, examples/queries_devel/
    query_syntax.txt:18-23)."""
    customer = load_table(spark, "customer", sf_dir)
    return customer.select(
        F.col("c_custkey").alias("cid"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "derived_column",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
       CAST(l_quantity >= 25 AS BIGINT) AS bulk_flag
FROM lineitem
""",
    tags=("core",),
)
def derived_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived column `t[:new] = expr(cols)` (reference designed-only:
    examples/queries_devel/q02.jl tstamp derivation; TODO note at
    src/capture-api.jl:56) plus bool→int conversion (reference
    examples/queries_devel/q05.jl:21-22 `convert(Vector{Int64}, ...)`)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
        (F.col("l_quantity") >= 25).cast("long").alias("bulk_flag"),
    )


@register(
    "join_dup_keys",
    oracle="""
SELECT o_custkey AS cid, o_orderkey, o_totalprice, c_name, c_acctbal
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    tags=("core",),
)
def join_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with duplicate keys multiplying (reference
    test/join_test1.jl:36-37 expects [1,1,3]) and the key-rename output
    convention (4th arg of reference join, src/capture-api.jl:318-333)."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    j = join(orders, customer, "o_custkey", "c_custkey", "cid")
    return j.select("cid", "o_orderkey", "o_totalprice", "c_name", "c_acctbal")


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
""",
    tags=("core",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer joins — absent in the reference (SURVEY §2.3 'Not
    present'), built into the new surface via `how=`."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi_anti",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS has_urgent
FROM customer c
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON c.c_custkey = o.o_custkey
""",
    tags=("core",),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (new surface): customers flagged by whether they
    have an urgent order — union of a semi-join (flag 1) and an
    anti-join (flag 0)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    cond = customer.c_custkey == urgent.o_custkey
    semi = customer.join(urgent, cond, "left_semi").select(
        "c_custkey", "c_name", F.lit(1).alias("has_urgent")
    )
    anti = customer.join(urgent, cond, "left_anti").select(
        "c_custkey", "c_name", F.lit(0).alias("has_urgent")
    )
    return table_vcat(semi, anti)


@register(
    "agg_sum_count_max",
    oracle="""
SELECT o_custkey AS cid,
       round(sum(o_totalprice), 2) AS total_spend,
       count(*) AS n_orders,
       max(o_totalprice) AS max_order
FROM orders
GROUP BY o_custkey
""",
    tags=("core",),
)
def agg_sum_count_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by aggregate with sum/length/maximum — the reference's
    complete reduction set (reference test/aggregate_test1.jl:13-49;
    combiner/reducer strings src/cgen-hpat-pattern-match-table.jl:
    686-787) plus key rename (test/aggregate_rename_test.jl)."""
    orders = load_table(spark, "orders", sf_dir)
    return aggregate(
        orders,
        "o_custkey",
        [
            ("total_spend", F.round(F.sum("o_totalprice"), 2)),
            ("n_orders", F.count(F.lit(1))),
            ("max_order", F.max("o_totalprice")),
        ],
        key_alias="cid",
    )


@register(
    "agg_conditional",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
       sum(CASE WHEN l_quantity >= 30 THEN l_quantity ELSE 0 END) AS bulk_qty,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("core",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over element-wise expressions — the reference
    evaluates `sum(:val2 .== 1.1)` by materializing the boolean column
    then reducing (src/capture-api.jl:387-479); Spark fuses the
    expression into the partial aggregate (no materialization). avg is
    new surface (reference computable only as sum/count)."""
    li = load_table(spark, "lineitem", sf_dir)
    return aggregate(
        li,
        "l_returnflag",
        [
            ("n_discounted", F.sum((F.col("l_discount") > 0.05).cast("long"))),
            (
                "bulk_qty",
                F.sum(
                    F.when(F.col("l_quantity") >= 30, F.col("l_quantity")).otherwise(
                        0.0
                    )
                ),
            ),
            ("avg_price", F.round(F.avg("l_extendedprice"), 4)),
        ],
    )


@register(
    "count_distinct_agg",
    oracle="""
SELECT user_id,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
""",
    tags=("core",),
)
def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`length(unique(expr))` exact distinct (reference
    test/length_unique_test.jl; physical plan src/cgen-hpat-pattern-
    match-table.jl:844-923) mixed with plain reductions in one agg."""
    events = load_table(spark, "events", sf_dir)
    return aggregate(
        events,
        "user_id",
        [
            ("n_types", F.countDistinct("event_type")),
            ("n_events", F.count(F.lit(1))),
            ("total_value", F.round(F.sum("value"), 2)),
        ],
    )


@register(
    "union_all_vcat",
    oracle="""
SELECT * FROM (
  SELECT o_custkey AS cid, round(sum(o_totalprice), 2) AS val
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
  UNION ALL
  SELECT o_custkey AS cid, round(sum(o_totalprice), 2) AS val
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
)
""",
    tags=("core",),
)
def union_all_vcat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table vcat `[t2; t3]` of two aggregates — exactly the shape of
    reference test/tables_cat.jl:16-21 (duplicate keys preserved, no
    dedup)."""
    orders = load_table(spark, "orders", sf_dir)

    def spend(status: str) -> DataFrame:
        return aggregate(
            table_filter(orders, F.col("o_orderstatus") == status),
            "o_custkey",
            [("val", F.round(F.sum("o_totalprice"), 2))],
            key_alias="cid",
        )

    return table_vcat(spend("O"), spend("F"))


@register(
    "not_null_filter",
    oracle="""
SELECT event_id, user_id, value FROM events
WHERE value IS NOT NULL AND user_id IS NOT NULL
""",
    tags=("core",),
)
def not_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real NOT-NULL semantics replacing the reference's sentinel
    `t[:c > typemin(Int32)]` hack (reference test/q05_test.jl:45-46;
    SURVEY §2.2 — the divergence is deliberate and documented)."""
    events = load_table(spark, "events", sf_dir)
    return table_filter(
        events, F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", "value")


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("core",),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row distinct — new surface (SURVEY §2.6 'not present')."""
    li = load_table(spark, "lineitem", sf_dir)
    return distinct_rows(li.select("l_returnflag", "l_linestatus"))


@register(
    "intersect_keys",
    oracle="""
SELECT o_custkey AS cid FROM orders
INTERSECT
SELECT c_custkey AS cid FROM customer WHERE c_mktsegment = 'BUILDING'
""",
    tags=("core",),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return intersect(
        orders.select(F.col("o_custkey").alias("cid")),
        customer.filter(F.col("c_mktsegment") == "BUILDING").select(
            F.col("c_custkey").alias("cid")
        ),
    )


@register(
    "except_keys",
    oracle="""
SELECT c_custkey AS cid FROM customer
EXCEPT
SELECT o_custkey AS cid FROM orders
""",
    tags=("core",),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never ordered — EXCEPT (new surface)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return except_rows(
        customer.select(F.col("c_custkey").alias("cid")),
        orders.select(F.col("o_custkey").alias("cid")),
        keep_duplicates=False,
    )


@register(
    "global_reductions",
    oracle="""
SELECT round(sum(l_quantity), 2) AS total_qty,
       max(l_extendedprice) AS max_price,
       min(l_shipdate) AS first_ship,
       count(*) AS n_rows
FROM lineitem
""",
    tags=("core",),
)
def global_reductions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table reductions — the reference's parfor reductions +
    MPI_Allreduce (src/distributed-pass.jl:1248-1274); Spark's partial
    aggregate per partition + single merge is the same tree."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "latest_record_compaction",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate, o_totalprice AS latest_totalprice
FROM ranked WHERE rn = 1
""",
    tags=("core",),
)
def latest_record_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert compaction: keep only the LATEST record per key — the
    standard pass that turns an append-only change log into current
    state (Hudi/Delta "merge on read" compaction; here: latest order
    per customer). Deterministic tiebreak on o_orderkey for same-day
    orders (CLAUDE.md invariant).

    Plan: row_number over (key, recency) — ONE shuffle keyed on the
    compaction key; at 100 TB this is the shape log-compaction jobs
    run nightly. A max-timestamp groupBy + self-join twin would
    shuffle twice and re-scan; the window form is strictly better
    because the per-key group fits a single sort run."""
    orders = load_table(spark, "orders", sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


@register(
    "null_safe_join",
    oracle="""
WITH keyed AS (
  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg,
         c_acctbal
  FROM customer
), counts AS (
  SELECT seg, count(*) AS n_customers FROM keyed GROUP BY seg
), bals AS (
  SELECT seg, round(avg(c_acctbal), 2) AS avg_balance FROM keyed GROUP BY seg
)
SELECT c.seg, c.n_customers::BIGINT AS n_customers, b.avg_balance
FROM counts c JOIN bals b ON c.seg IS NOT DISTINCT FROM b.seg
""",
    tags=("core",),
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the NULL
    group participates in the join instead of silently dropping — the
    semantic a standard equi-join gets wrong when the join key is a
    derived nullable (here: negative-balance customers bucketed as
    NULL segment). tests/test_null_semantics.py pins the contrast with
    the null-dropping plain join.

    Plan: two aggregates over one scan joined on eqNullSafe; Catalyst
    plans it as a regular hash join with a null-safe comparator (NULL
    hashes like any key) — same single-shuffle shape, no fallback to
    nested loops."""
    cust = load_table(spark, "customer", sf_dir)
    keyed = cust.select(
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_acctbal",
    )
    counts = keyed.groupBy("seg").agg(F.count(F.lit(1)).alias("n_customers"))
    bals = keyed.groupBy("seg").agg(F.round(F.avg("c_acctbal"), 2).alias("avg_balance"))
    c, b = counts.alias("c"), bals.alias("b")
    return c.join(b, F.col("c.seg").eqNullSafe(F.col("b.seg"))).select(
        F.col("c.seg").alias("seg"), "n_customers", "avg_balance"
    )


_incremental_oracle = """
SELECT event_type, ts::DATE AS day,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS sum_value,
       floor(sum(value) / count(*) * 10000) / 10000 AS avg_value
FROM events
GROUP BY event_type, day
"""


@register("incremental_daily_counts", oracle=_incremental_oracle, tags=("relational",))
def incremental_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a daily-rollup snapshot is merged
    with a new-data delta WITHOUT rescanning history — the pattern
    every warehouse ingestion job at 100 TB relies on (recompute only
    the delta, merge algebraically). The plan aggregates the two eras
    SEPARATELY (history = days before 2024-01-16, delta = the rest),
    unions the partial states, and re-aggregates — while the oracle is
    a plain one-pass GROUP BY over everything. The hash match IS the
    merge-associativity proof: merge(agg(A), agg(B)) == agg(A ∪ B).

    Only algebraic aggregates decompose this way — count and sum merge
    by summing; avg must be DERIVED from merged sum/count (merging
    avgs directly is wrong under unequal group sizes, pinned in
    tests/test_incremental.py). Each era's aggregate is partial+final
    with map-side combine; the merge union shuffles only
    |groups| × 2 rows, not events. In production the history side is a
    stored snapshot, so the scan cost is delta-only; here both eras
    derive from the fixture so the driver can check the algebra."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts")
    )
    split = F.lit("2024-01-16").cast("date")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )

    merged = (
        snap(ev.filter(F.col("day") < split))
        .unionByName(snap(ev.filter(F.col("day") >= split)))
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        # floor-quantize, not round: count is often a power of two, so the
        # quotient lands EXACTLY on .5 decimal boundaries where Spark
        # (BigDecimal HALF_UP) and DuckDB (mul-round-div) disagree.
        (F.floor(F.col("sum_value") / F.col("n_events") * 1e4) / 1e4).alias(
            "avg_value"
        ),
    )
