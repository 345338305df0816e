"""Scale-strategy tests: salted aggregate/join equivalence, bucketed
co-located join (no shuffle exchange in the plan), checkpoint lineage
truncation, AQE coalescing — the disciplines the 100 TB design leans on,
each verified either by result-equivalence or by plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.operators.skew import salted_aggregate, salted_join
from hpat_jl_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain(spark):
    orders = load_table(spark, "orders", SF)
    plain = {
        (r.o_custkey): (r.n, round(r.total, 2))
        for r in orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))
        .collect()
    }
    salted = {
        (r.o_custkey): (r.n, round(r.total, 2))
        for r in salted_aggregate(
            orders,
            "o_custkey",
            partial_aggs=[
                ("s", F.sum("o_totalprice")),
                ("c", F.count(F.lit(1))),
            ],
            final_aggs=[("total", F.sum("s")), ("n", F.sum("c"))],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    plain = sorted(
        (r.o_orderkey, r.c_name)
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r.o_orderkey, r.c_name)
        for r in salted_join(orders, customer, "o_custkey", "c_custkey", 8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark):
    """Bucketing both sides on the join key pre-shuffles at write time —
    the join then runs with zero exchanges (the co-located join the
    reference achieved only by always hash-shuffling both sides at
    query time, reference src/cgen-hpat-pattern-match-table.jl:219-320)."""
    orders = load_table(spark, "orders", SF)
    customer = load_table(spark, "customer", SF)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (orders.write.mode("overwrite").bucketBy(4, "o_custkey")
     .sortBy("o_custkey").saveAsTable("b_orders"))
    (customer.write.mode("overwrite").bucketBy(4, "c_custkey")
     .sortBy("c_custkey").saveAsTable("b_customer"))
    bo, bc = spark.table("b_orders"), spark.table("b_customer")
    # disable broadcast so the planner must consider a sort-merge join —
    # bucketing then supplies the partitioning and no shuffle is needed
    # (with broadcast on, tiny dims broadcast instead: also shuffle-free)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert j.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_checkpoint_truncates_lineage(spark, tmp_path):
    """Reference checkpointing (§2.10) snapshotted loop state to disk;
    Spark's df.checkpoint materializes and cuts lineage — the iterative-
    algorithm safety net."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    li = load_table(spark, "lineitem", SF)
    derived = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    cp = derived.checkpoint(eager=True)
    assert cp.count() == derived.count()
    # lineage is cut: the checkpointed plan scans the materialized RDD
    plan = cp._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_aqe_coalesces_small_shuffle(spark):
    """With AQE on, a 32-partition shuffle of tiny data coalesces to
    few partitions at runtime — partition counts adapt to data, not
    config (the reference's fixed num_pes cannot)."""
    li = load_table(spark, "lineitem", SF)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("q")
    )
    agg.collect()
    n_parts = agg.rdd.getNumPartitions()
    assert n_parts <= 4, f"AQE should coalesce tiny shuffles, got {n_parts}"


def test_ewma_matches_pandas(spark):
    """The windowed closed form (exponential rebasing → one prefix sum)
    must equal the sequential recurrence pandas ewm(adjust=False) runs."""
    import numpy as np
    import pandas as pd

    from hpat_jl_spark.operators.windowed import ewma_regular

    rng = np.random.default_rng(7)
    rows = [
        (int(k), int(i), float(v))
        for k in range(3)
        for i, v in enumerate(rng.normal(size=40))
    ]
    df = spark.createDataFrame(rows, "k long, i long, x double")
    out = (
        ewma_regular(df, "k", "i", "x", alpha=0.3)
        .toPandas()
        .sort_values(["k", "i"], ignore_index=True)
    )
    pdf = pd.DataFrame(rows, columns=["k", "i", "x"]).sort_values(
        ["k", "i"], ignore_index=True
    )
    expected = pdf.groupby("k")["x"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    assert np.abs(out["ewma"].to_numpy() - expected.to_numpy()).max() < 1e-9


def test_stratified_sample_proportions(spark):
    """sampleBy keep-fractions hold per stratum (Bernoulli tolerance)
    and the sample is seed-deterministic."""
    from hpat_jl_spark import registry

    registry.load_all_plans()
    fn = registry.REGISTRY["stratified_sample_sources"].fn
    sf = "/root/testdata/sf0.01"
    from hpat_jl_spark.tables import load_table

    totals = {
        r.source: r.n
        for r in load_table(spark, "documents", sf)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {r.source: r.n_kept for r in fn(spark, sf).collect()}
    fractions = {"web": 0.3, "wiki": 1.0, "books": 1.0, "code": 0.6}
    for src, frac in fractions.items():
        if src not in totals:
            continue
        n, k = totals[src], kept.get(src, 0)
        expect = frac * n
        tol = 4 * (n * frac * (1 - frac)) ** 0.5 + 1  # 4σ + slack
        assert abs(k - expect) <= tol, (src, k, expect, tol)
    # determinism: same seed → same counts
    kept2 = {r.source: r.n_kept for r in fn(spark, sf).collect()}
    assert kept == kept2


def test_runtime_bloom_filter_injection(spark):
    """Runtime Bloom-filter pushdown (Spark's runtime row-group
    filtering for selective SMJ joins): with the optimizer flag on, the
    selective dim side injects a bloom_filter_agg that pre-filters the
    fact scan — the 100 TB lever for joins AQE can't broadcast. The
    application-side size threshold defaults to 10 GB, so local
    fixtures need it lowered; results must be identical either way."""
    from pyspark.sql import functions as F

    from hpat_jl_spark.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
        part = load_table(spark, "part", "/root/testdata/sf0.001").filter(
            F.col("p_brand") == "Brand#23"
        )
        j = li.join(part, li.l_partkey == part.p_partkey).groupBy("p_brand").count()
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan
        with_bloom = {tuple(r) for r in j.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    part = load_table(spark, "part", "/root/testdata/sf0.001").filter(
        F.col("p_brand") == "Brand#23"
    )
    plain = {
        tuple(r)
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .count()
        .collect()
    }
    assert with_bloom == plain


def test_hash_stratified_sample_fractions_and_stability(spark):
    """stratified_sample_hash: per-stratum keep rates track the target
    fractions (hash-uniformity tolerance) and the kept set is a pure
    function of the data — rerunning yields IDENTICAL counts, no seed
    involved."""
    from hpat_jl_spark import registry
    from hpat_jl_spark.plans.extended import _STRAT_DEFAULT, _STRAT_FRACS
    from hpat_jl_spark.tables import load_table

    registry.load_all_plans()
    fn = registry.REGISTRY["stratified_sample_hash"].fn
    sf = "/root/testdata/sf0.01"
    totals = {
        r.source: r.n
        for r in load_table(spark, "documents", sf)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {r.source: r.n_kept for r in fn(spark, sf).collect()}
    for src, n in totals.items():
        frac = _STRAT_FRACS.get(src, _STRAT_DEFAULT)
        expect = frac * n
        tol = 4 * (n * frac * (1 - frac)) ** 0.5 + 1
        assert abs(kept.get(src, 0) - expect) <= tol, (src, kept.get(src), expect)
    # full-keep stratum is EXACT, not statistical
    assert kept["src2"] == totals["src2"]
    assert kept == {r.source: r.n_kept for r in fn(spark, sf).collect()}
