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


def test_no_forced_broadcast_of_osf_tables(spark):
    """VERDICT r01 regression: forced F.broadcast hints are reserved for
    provably-bounded inputs (nation/region derivations, 1-row
    aggregates). O(sf) sides — customer, supplier, part, filtered
    orders — must carry NO hint, so AQE sizes them at runtime instead
    of pinning a driver-OOM plan at sf100. The analyzed logical plan
    records every hint as UnresolvedHint/ResolvedHint; we cap the count
    per query at the number of bounded-dimension hints the plan
    legitimately keeps."""
    from hpat_jl_spark import registry

    registry.load_all_plans()
    # query -> max allowed broadcast hints (the bounded ones)
    budgets = {
        "q5_local_supplier_volume": 2,   # region filter + asia_nations
        "q7_volume_shipping": 2,         # nation in two roles
        "q8_market_share": 3,            # region filter + europe_keys + nation
        "q10_returned_items": 1,         # nation
        "q14_promo_revenue": 0,
        "q15_top_supplier": 1,           # 1-row max aggregate
        "q17_small_quantity_revenue": 0,
        "q19_disjunctive_predicates": 0,
        "q21_waiting_supplier": 2,       # nation filter + SHUFFLE_HASH
                                         # (not a broadcast) on the
                                         # co-partitioned line match
        # NOTE: a hinted subtree reused on both sides of a self-join
        # appears twice in the analyzed plan, so budgets count hint
        # NODES, not distinct hints.
        "q2_min_cost_supplier": 4,       # nested region+nation hints ×2 sides
        "q9_product_type_profit": 1,     # nation
        "q11_important_stock": 3,        # nation ×2 natps sides + threshold
        "q16_supplier_count": 0,
        "q20_surplus_suppliers": 1,      # nation filter
    }
    for name, budget in budgets.items():
        df = registry.REGISTRY[name].fn(spark, SF)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        hints = analyzed.count("Hint")
        assert hints <= budget, (
            f"{name}: {hints} broadcast hints in logical plan "
            f"(budget {budget}) — did an O(sf) hint creep back in?"
        )
