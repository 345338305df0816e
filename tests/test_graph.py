"""Planted-graph semantics for plans/graph.py (the sf0.01 sweep checks
the fixture result against DuckDB; here the algorithm is pinned on a
hand-countable graph, including the degree-orientation invariants).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark import registry
from hpat_jl_spark.registry import REGISTRY
from tests.conftest import SF_SMOKE

registry.load_all_plans()


def _count_triangles(spark, edge_list):
    """Run the oriented-wedge algorithm on an explicit edge list by
    staging it as a tiny lineitem-shaped table via the plan's own
    building blocks (mirrors plans/graph.triangle_count after the
    co-purchase edge build)."""
    edges = spark.createDataFrame(edge_list, "u long, v long").distinct()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ann = (
        edges.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    adj = oriented.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("nbrs")
    )
    au = adj.select(F.col("src").alias("src"), F.col("nbrs").alias("nbrs_u"))
    av = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_v"))
    row = (
        oriented.join(au, "src")
        .join(av, "dst")
        .select(F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
        .first()
    )
    return row.n


def test_triangle_algorithm_goldens(spark):
    # K4 has 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _count_triangles(spark, k4) == 4
    # a 4-cycle has none
    assert _count_triangles(spark, [(1, 2), (2, 3), (3, 4), (1, 4)]) == 0
    # hub star + one closing edge: exactly 1 triangle (hub 0 has high
    # degree — orientation must pivot wedges at low-degree endpoints)
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    assert _count_triangles(spark, star) == 1
    # two triangles sharing an edge
    assert _count_triangles(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]) == 2


def test_triangle_count_runs_on_fixture(spark):
    row = REGISTRY["triangle_count"].fn(spark, SF_SMOKE).first()
    assert row.n_nodes > 0 and row.n_edges > 0 and row.n_triangles >= 0


def test_latest_record_compaction_planted(spark, tmp_path):
    import pandas as pd

    # change-log: customer 1 has three versions, customer 2 one; the
    # same-date pair for customer 1 must tiebreak on the higher orderkey
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_custkey": [1, 1, 1, 2],
                "o_orderkey": [10, 11, 12, 20],
                "o_orderdate": pd.to_datetime(
                    ["2024-01-01", "2024-02-01", "2024-02-01", "2024-03-01"]
                ).date,
                "o_totalprice": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    out = {
        r.o_custkey: r.o_orderkey
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert out == {1: 12, 2: 20}


def test_clustering_coefficient_fixture_bounds(spark):
    rows = REGISTRY["clustering_coefficient"].fn(spark, SF_SMOKE).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert 0.0 <= r.clustering <= 1.0
        assert r.degree >= 2
        # n_triangles cannot exceed C(degree, 2)
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2
    # deterministic ordering
    key = [(-r.n_triangles, r.node) for r in rows]
    assert key == sorted(key)


def test_adamic_adar_planted(spark):
    """Hand-computed Adamic-Adar on an explicit bipartite graph,
    mirroring plans/graph.link_prediction_customers after the cp
    build: part 10 shared by {1,2} (dp=2), part 11 by {1,2,3} (dp=3),
    part 12 by {3} (dp=1, below center floor), part 13 by everyone
    (hub, above cap when cap=3 -> excluded)."""
    import math

    cp = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11), (3, 12),
         (1, 13), (2, 13), (3, 13), (4, 13)],
        "c long, p long",
    ).distinct()
    centers = (
        cp.groupBy("p").agg(F.count(F.lit(1)).alias("dp"))
        .filter(F.col("dp").between(2, 3))
    )
    a = cp.select("p", F.col("c").alias("u"))
    b = cp.select("p", F.col("c").alias("v"))
    scored = (
        centers.join(a, "p").join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_parts"),
            F.round(F.sum(1.0 / F.log("dp")), 6).alias("adamic_adar"),
        )
    )
    got = {(r.u, r.v): (r.common_parts, r.adamic_adar) for r in scored.collect()}
    aa2, aa3 = 1 / math.log(2), 1 / math.log(3)
    assert got == {
        (1, 2): (2, round(aa2 + aa3, 6)),  # parts 10 (dp=2) + 11 (dp=3)
        (1, 3): (1, round(aa3, 6)),        # part 11 only
        (2, 3): (1, round(aa3, 6)),
        # customer 4 appears nowhere: its only part is the capped hub
    }


def test_link_prediction_fixture_invariants(spark):
    rows = REGISTRY["link_prediction_customers"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r.adamic_adar for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.u < r.v and r.common_parts >= 1 for r in rows)
