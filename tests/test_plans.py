"""Plan-level assertions — the Spark analogue of the reference's
white-box compiler test (test/index_test.jl asserts an internal
partitioning decision; here we assert on the physical plan): predicate
pushdown reaches the Parquet scan, column pruning cuts ReadSchema,
dimension joins go broadcast, and HLL accuracy holds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark import registry
from hpat_jl_spark.tables import load_table

registry.load_all_plans()
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = registry.REGISTRY["filter_select"].fn(spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_column_pruning_cuts_readschema(spark):
    df = registry.REGISTRY["filter_select"].fn(spark, SF)
    plan = _plan(df)
    # only the 3 projected columns are read, not all 6 of orders
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderkey" in rs and "o_totalprice" in rs
    assert "o_orderdate" not in rs and "o_orderpriority" not in rs


def test_q26_broadcasts_dimension(spark):
    df = registry.REGISTRY["q26"].fn(spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_q1_stays_in_codegen(spark):
    df = registry.REGISTRY["q1_pricing_summary"].fn(spark, SF)
    plan = _plan(df)
    # partial + final hash aggregation (the reference's combiner/reducer
    # plan) and zero Python in the hot path; with AQE the plan string is
    # adaptive, so codegen spans appear only post-execution
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_topk_uses_take_ordered(spark):
    df = registry.REGISTRY["q3_shipping_priority"].fn(spark, SF)
    assert "TakeOrderedAndProject" in _plan(df)


def test_approx_distinct_accuracy(spark):
    out = registry.REGISTRY["approx_distinct"].fn(spark, SF).collect()
    for r in out:
        assert abs(r.approx_orders - r.exact_orders) <= max(
            3, 0.05 * r.exact_orders
        ), f"HLL too far off: {r}"


def test_portable_hll_accuracy_and_no_python(spark):
    """hll_distinct_portable must land within ~3σ of the exact count
    (σ = 1.04/√512 ≈ 4.6% for 512 registers) and stay entirely
    JVM-side — the sketch is Column math, not a UDF."""
    df = registry.REGISTRY["hll_distinct_portable"].fn(spark, SF)
    for r in df.collect():
        assert abs(r.hll_estimate - r.exact_orders) <= max(
            5, 0.14 * r.exact_orders
        ), f"portable HLL too far off: {r}"
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semi_join_plans_as_semi(spark):
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    semi = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    )
    assert "LeftSemi" in _plan(semi)


def test_filter_pushes_through_join(spark):
    """The reference's one real optimizer rewrite (push filter below
    join, src/datatable-pass.jl:336-502) — Catalyst must do the same:
    a post-join single-side filter appears as a pushed filter on the
    scan side."""
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).filter(
        F.col("o_totalprice") > 100000.0
    )
    plan = _plan(j)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_approx_percentile_tracks_exact(spark):
    """The documented scale twin of exact percentiles: t-digest
    approx_percentile must land within 1% of the exact rank on the
    price distribution (accuracy=10000 → error <= 0.01%ile * N)."""
    df = load_table(spark, "lineitem", SF)
    row = df.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.95)) AS exact",
        "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000) AS approx",
    ).collect()[0]
    for e, a in zip(row.exact, row.approx):
        assert abs(a - e) / e < 0.01, (e, a)


def test_approx_percentile_rank_error_bound(spark):
    """The approximate regime of approx_percentiles_sketch: at low
    accuracy the GK sketch guarantees rank error ≤ n/accuracy. 10k
    distinct values, accuracy 100 → returned element's true rank must
    be within n/100 = 100 (+1 slack) of the target rank."""
    from pyspark.sql import functions as F

    n, accuracy = 10_000, 100
    df = spark.range(n).select((F.col("id") * 7 % n).cast("double").alias("v"))
    [r] = df.agg(
        F.percentile_approx("v", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)), accuracy).alias("q")
    ).collect()
    for p, got in zip([0.25, 0.5, 0.9], r.q):
        true_rank = int(got)  # values are exactly 0..n-1, value == rank
        assert abs(true_rank - p * (n - 1)) <= n / accuracy + 1, (p, got)
