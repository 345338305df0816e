"""Scalar-function surface the reference never had (SURVEY §2.7:
'String / date / JSON / map functions: None implemented — full F.*
surface is free in Spark, expose it in the new API'): string ops, date
parts/arithmetic, JSON extraction, statistical aggregates, exact
percentiles. One oracle-checked query per family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table


@register(
    "string_surface",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       substr(c_mktsegment, 1, 4) AS seg4,
       concat(c_name, ':', c_mktsegment) AS tagged,
       CAST(c_name LIKE '%1%' AS BIGINT) AS has_one,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       length(c_name) AS name_len,
       replace(c_mktsegment, 'ING', '*') AS repl
FROM customer
""",
    tags=("scalar",),
)
def string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias(
            "tagged"
        ),
        F.col("c_name").like("%1%").cast("long").alias("has_one"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_mktsegment"), F.lit("ING"), F.lit("*")).alias("repl"),
    )


@register(
    "date_surface",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dy,
       date_trunc('month', o_orderdate) AS month_start,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
FROM orders
""",
    tags=("scalar",),
)
def date_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
    )


@register(
    "json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
""",
    tags=("scalar",),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction (events.props is a JSON string)."""
    events = load_table(spark, "events", sf_dir)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@register(
    "conditional_exprs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_returnflag, 'N'), 'NONE') AS flag_or_none,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_quantity, 25.0) AS capped_qty,
       CASE WHEN l_discount > 0.05 THEN 'high'
            WHEN l_discount > 0.02 THEN 'mid'
            ELSE 'low' END AS disc_band,
       CAST(l_quantity BETWEEN 10 AND 20 AS BIGINT) AS mid_qty
FROM lineitem
""",
    tags=("scalar",),
)
def conditional_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression surface: coalesce / nullif / greatest /
    least / multi-branch CASE / BETWEEN — all codegen'd branches."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")
        ).alias("flag_or_none"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("capped_qty"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.col("l_quantity").between(10, 20).cast("long").alias("mid_qty"),
    )


@register(
    "stats_aggregates",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_discount), 6) AS var_disc,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("scalar",),
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
    )


@register(
    "percentiles_exact",
    oracle="""
SELECT o_orderstatus,
       round(median(o_totalprice), 2) AS med_price,
       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar",),
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics in both
    engines). Scale note: exact percentiles sort each group — the 100 TB
    path is approx_percentile (t-digest sketch)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95"),
    )


@register(
    "explode_tokens",
    oracle="""
SELECT token, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents)
GROUP BY token
HAVING count(*) > 50
""",
    tags=("scalar",),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode → aggregate (UNNEST twin): corpus token frequencies."""
    from hpat_jl_spark.functions.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 50)
    )


_SQL_NATION_REVENUE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 5
"""


@register(
    "sql_nation_revenue",
    oracle=_SQL_NATION_REVENUE.replace("count(*) AS", "count(*)::BIGINT AS"),
    tags=("sql",),
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point end-to-end: the SAME ANSI text runs on Spark
    (via api.sql over registered views) and on DuckDB as the oracle —
    demonstrating the open `spark.sql` frontend the reference lacked
    (its only entry was the @acc macro, SURVEY §3 entry point A). The
    plan is identical to the DataFrame-built equivalent: one fact
    shuffle, broadcast dims, partial+final agg, TakeOrdered top-k."""
    from hpat_jl_spark.api import sql as run_sql

    return run_sql(spark, _SQL_NATION_REVENUE, sf_dir)


@register("monte_carlo_pi", oracle=None, tags=("scalar",))
def monte_carlo_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship benchmark (README.md:88-105 claims
    ">1000× faster than Spark" for MPI-compiled sampling): π by
    rejection sampling, expressed as range → two seeded rand columns →
    filter → count. Whole-stage codegen evaluates the entire pipeline
    in one fused loop per partition — no Python, no materialized
    sample table; the per-partition LCG state is the only memory.
    Seeded → deterministic; rows-only driver check (no DuckDB PRNG
    twin); value asserted ≈ π in tests."""
    n = 1_000_000
    samples = spark.range(n).select(
        (F.rand(seed=1) * 2 - 1).alias("x"), (F.rand(seed=2) * 2 - 1).alias("y")
    )
    inside = samples.filter(F.col("x") ** 2 + F.col("y") ** 2 <= 1.0)
    return inside.agg(
        (F.lit(4.0) * F.count(F.lit(1)) / F.lit(float(n))).alias("pi_estimate"),
        F.count(F.lit(1)).alias("n_inside"),
    )


# ---- quasi-Monte-Carlo π: the HASH-GATED twin of monte_carlo_pi ----
# Halton points (bases 2 and 3) with the radical inverses kept as exact
# INTEGERS: x_i = rev2(i)/2^20, y_i = rev3(i)/3^13, and the quarter-disk
# test x²+y²≤1 cleared of denominators:
#     (rev2·3^13)² + (rev3·2^20)² ≤ (2^20·3^13)²     (≈2.8e24, exact in
# decimal(38,0) on the Spark side and HUGEINT in DuckDB). ZERO floating
# point anywhere until the final dyadic k/2^14 estimate — both engines
# count the identical set, so the driver value-hash matches exactly.
_QMC_N = 1 << 16
_B2, _D2 = 20, 1 << 20         # 20 base-2 digits
_B3, _D3 = 13, 3**13           # 13 base-3 digits (3^13 > 2^20)
_QMC_LIMIT = (_D2 * _D3) ** 2

_rev2_sql = " + ".join(
    f"((i // {2 ** b}) % 2) * {2 ** (_B2 - 1 - b)}" for b in range(_B2)
)
_rev3_sql = " + ".join(
    f"((i // {3 ** d}) % 3) * {3 ** (_B3 - 1 - d)}" for d in range(_B3)
)
_qmc_oracle = f"""
WITH pts AS (
  SELECT ({_rev2_sql})::HUGEINT AS a, ({_rev3_sql})::HUGEINT AS b
  FROM range(1, {_QMC_N + 1}) t(i)
)
SELECT count(*)::BIGINT AS n_points,
       (count(*) FILTER (WHERE a*a*{_D3 * _D3} + b*b*{_D2}::HUGEINT*{_D2}
                               <= {_QMC_LIMIT}::HUGEINT))::BIGINT AS n_inside,
       4.0 * (count(*) FILTER (WHERE a*a*{_D3 * _D3} + b*b*{_D2}::HUGEINT*{_D2}
                               <= {_QMC_LIMIT}::HUGEINT)) / count(*) AS pi_estimate
FROM pts
"""


@register("quasi_monte_carlo_pi", oracle=_qmc_oracle, tags=("scalar",))
def quasi_monte_carlo_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """π by low-discrepancy (Halton) integration — the deterministic,
    oracle-gated companion to monte_carlo_pi (whose LCG stream has no
    DuckDB twin; SURVEY §2.7 random). Same fused plan shape: range →
    per-row integer radical inverses → filter → count, all whole-stage
    codegen; the sample set is a pure function of the index so the
    result is engine-independent by construction, not by PRNG luck.
    Error is O(log²N/N) vs MC's O(1/√N): 2^16 points land within 1e-3
    of π."""
    rev2 = F.expr(
        " + ".join(
            f"((i div {2 ** b}) % 2) * {2 ** (_B2 - 1 - b)}" for b in range(_B2)
        )
    )
    rev3 = F.expr(
        " + ".join(
            f"((i div {3 ** d}) % 3) * {3 ** (_B3 - 1 - d)}" for d in range(_B3)
        )
    )
    par = spark.sparkContext.defaultParallelism
    pts = (
        spark.range(1, _QMC_N + 1, numPartitions=par)
        .select(F.col("id").alias("i"))
        .select(
            rev2.cast("decimal(38,0)").alias("a"),
            rev3.cast("decimal(38,0)").alias("b"),
        )
    )
    inside = (
        F.col("a") * F.col("a") * F.lit(_D3 * _D3)
        + F.col("b") * F.col("b") * F.lit(_D2) * F.lit(_D2)
    ) <= F.lit(str(_QMC_LIMIT)).cast("decimal(38,0)")
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(inside.cast("long")).alias("n_inside"),
        (
            F.lit(4.0) * F.sum(inside.cast("long")) / F.count(F.lit(1))
        ).alias("pi_estimate"),
    )


_from_json_oracle = """
SELECT event_type,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_total,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
"""


@register("json_struct_agg", oracle=_from_json_oracle, tags=("scalar",))
def json_struct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON parse (from_json with a declared schema — one
    parse per row, reused by every downstream reference, unlike
    repeated get_json_object path extraction) feeding a filter +
    aggregate; the JsonToStructs expression runs inside codegen and
    the filter on the parsed field still prunes before the shuffle."""
    from pyspark.sql import types as T

    events = load_table(spark, "events", sf_dir)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = events.select(
        "event_type", F.from_json("props", schema).alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


_map_funcs_oracle = """
SELECT user_id, event_type, n
FROM (SELECT user_id, event_type, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2)
WHERE n >= 8
"""


@register("map_functions_surface", oracle=_map_funcs_oracle, tags=("scalar",))
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (absent in the reference — its type system has
    no containers at all, SURVEY §1.2): per-user counts become a
    map<event_type, n> via map_from_entries, frequent entries are kept
    with map_filter (a codegen'd higher-order map lambda), and the map
    explodes back to rows. The oracle states the equivalent relational
    result — the map round-trip must be lossless."""
    ev = load_table(spark, "events", sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("counts")
    )
    frequent = as_map.select(
        "user_id",
        F.map_filter("counts", lambda k, v: v >= 8).alias("frequent"),
    )
    return frequent.select(
        "user_id", F.explode("frequent").alias("event_type", "n")
    )


@register(
    "approx_percentiles_sketch",
    oracle="""
SELECT o_orderstatus,
       round(quantile_disc(o_totalprice, 0.25), 2) AS p25,
       round(quantile_disc(o_totalprice, 0.50), 2) AS p50,
       round(quantile_disc(o_totalprice, 0.95), 2) AS p95
FROM orders
GROUP BY o_orderstatus
""",
    tags=("scalar", "sketch"),
)
def approx_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles: percentile_approx (Greenwald-Khanna)
    against DuckDB's quantile_disc — BOTH select discrete order
    statistics, and below the sketch's compression threshold GK is
    exact, so the hash check pins the sketch in its exact regime
    (verified identical through sf0.1). This is the 100 TB quantile
    path percentiles_exact's docstring points to: the sketch is
    mergeable (partial+final agg, no per-group sort), holding
    O(accuracy) state per group instead of the group itself. At real
    scale you dial ``accuracy`` DOWN and accept the ε·n = n/accuracy
    rank-error contract — that approximate regime is pinned separately
    in tests/test_plans.py::test_approx_percentile_rank_error_bound."""
    orders = load_table(spark, "orders", sf_dir)
    pcts = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.95)), 1_000_000
    )
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.element_at(pcts, 1), 2).alias("p25"),
        F.round(F.element_at(pcts, 2), 2).alias("p50"),
        F.round(F.element_at(pcts, 3), 2).alias("p95"),
    )


_equidepth_oracle = """
WITH b AS (
  SELECT quantile_disc(o_totalprice,
           [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bnds
  FROM orders),
a AS (
  SELECT len(list_filter(b.bnds, x -> o_totalprice > x)) + 1 AS bucket,
         o_totalprice
  FROM orders, b)
SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_rows,
       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM a GROUP BY bucket
"""


@register("equidepth_binning", oracle=_equidepth_oracle, tags=("scalar", "sketch"))
def equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) feature binning — the discretization pass
    feature pipelines run before building histograms/crossings: split a
    numeric column into 8 buckets holding ~n/8 rows each, report each
    bucket's population and [lo, hi] span.

    Scale shape: the OBVIOUS formulation — ntile(8) over a global
    ORDER BY — is a single-partition total sort, the one shape that
    cannot survive 100 TB (rejected; supplier_revenue_quartiles only
    gets away with an unpartitioned window because it feeds
    pre-aggregated rows). Instead: pass 1 computes the 7 inner octile
    boundaries with the mergeable GK sketch (partial+final agg, exact
    in this accuracy regime — same contract as
    approx_percentiles_sketch); pass 2 broadcasts that single 7-float
    row and assigns buckets ROW-LOCALLY (count of boundaries below the
    value, a codegen'd higher-order filter), then one hash agg. Two
    scans, zero sorts, zero Python; ties on a boundary go to the lower
    bucket on both engines by the shared `value > boundary` rule."""
    orders = load_table(spark, "orders", sf_dir)
    qs = F.array(*[F.lit(i / 8.0) for i in range(1, 8)])
    bnds = orders.agg(
        F.percentile_approx("o_totalprice", qs, 1_000_000).alias("bnds")
    )
    price = F.col("o_totalprice")
    bucket = F.size(F.filter("bnds", lambda x: price > x)) + 1
    return (
        orders.join(F.broadcast(bnds))
        .select(bucket.cast("bigint").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
