"""Plan-shape assertions for the TPC-H extension suites — verifying the
scale-critical physical properties, not just results (which
test_oracle_parity already pins): semi-join decorrelation, disjunctive
predicate extraction, broadcast dimension placement, and single-shuffle
window decorrelation for the EXISTS/NOT EXISTS pair.
"""

from __future__ import annotations

from hpat_jl_spark import registry

registry.load_all_plans()
SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    # the date-range filter reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q19_extracts_common_predicates(spark):
    plan = _plan(spark, "q19_disjunctive_predicates")
    # Catalyst extracts each side's implication of the cross-table
    # OR-of-ANDs and evaluates it at that side's scan: the lineitem
    # scan gets the quantity-range disjunction, the part scan gets the
    # brand/size disjunction — neither table carries unmatched rows
    # into the join
    lines = plan.splitlines()
    li_scan = [l for l in lines if "lineitem.parquet" in l][0]
    part_scan = [l for l in lines if "part.parquet" in l][0]
    assert "l_quantity" in li_scan and "DataFilters" in li_scan
    assert "p_brand" in part_scan and "DataFilters" in part_scan
    assert "BroadcastHashJoin" in plan


def test_q5_single_fact_shuffle(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    # all five dimension attachments broadcast; only lineitem⋈orders
    # may shuffle
    assert plan.count("BroadcastHashJoin") >= 4


def test_q21_decorrelates_to_one_window(spark):
    plan = _plan(spark, "q21_waiting_supplier")
    # the EXISTS/NOT-EXISTS pair is window arithmetic, not extra
    # self-joins of lineitem: exactly one Window operator block
    assert "Window" in plan
    # lineitem is scanned at most twice (per-supplier max + line match),
    # never a third time for the NOT EXISTS
    scans = [l for l in plan.splitlines() if "lineitem.parquet" in l and "Scan" in l]
    assert len(scans) <= 2, f"too many lineitem scans: {len(scans)}"


def test_q13_left_join_preserves_all_customers(spark):
    from hpat_jl_spark.tables import load_table

    out = registry.REGISTRY["q13_customer_distribution"].fn(spark, SF)
    # the right-side filter lives in the ON clause, so the left outer
    # join must preserve every customer: sum(custdist) == |customer|
    total = sum(r.custdist for r in out.collect())
    assert total == load_table(spark, "customer", SF).count()
