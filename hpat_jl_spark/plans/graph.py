"""Graph-analytics plans over data-derived graphs (companions to the
iterative layer's pagerank/connected-components, SURVEY §2.10). The
reference's graph story is its generic join/aggregate surface; these
show the same surface composing into the standard scalable graph
kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpat_jl_spark.registry import register
from hpat_jl_spark.tables import load_table


_triangle_oracle = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o WHERE a.p < b.p
)
SELECT (SELECT count(DISTINCT x)::BIGINT
        FROM (SELECT u AS x FROM edges UNION SELECT v FROM edges)) AS n_nodes,
       (SELECT count(*)::BIGINT FROM edges) AS n_edges,
       (SELECT count(*)::BIGINT FROM (
          SELECT 1 FROM edges e1
          JOIN edges e2 ON e1.v = e2.u
          JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)) AS n_triangles
"""


@register("triangle_count", oracle=_triangle_oracle, tags=("graph",))
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts appearing
    in the same order are adjacent) — the standard graph-cohesion
    kernel, here as the degree-oriented two-join algorithm
    (Schank & Wagner 2005; the MapReduce formulation is Suri &
    Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
    Last Reducer").

    Why not the naive a<b orientation the (equivalent) oracle uses: on
    a power-law graph a hub node with degree d contributes O(d²)
    wedges if wedges pivot on arbitrary nodes. Orienting every edge
    from the (degree, id)-SMALLER endpoint to the larger one and
    pivoting wedges only at the oriented source caps per-node wedge
    work at O(out_deg²) where out-degree is bounded by O(sqrt(m)) —
    total work O(m^1.5) independent of hubs, the shape that survives
    the "curse of the last reducer" at 100 TB. The count is identical
    either way, so the simple oracle pins correctness while the plan
    carries the scalable shape.

    Plan: per-order pair explosion is bounded by order size (≤7
    lineitems in TPC-H); degree join annotates both endpoints; wedge
    self-join pivots on the oriented source; one final equi-join
    closes wedges against the oriented edge set. All equi-joins on
    graph keys — no Python, nothing quadratic in hubs."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    edges = edges.localCheckpoint()  # reused 4×; cut the build lineage

    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ann = edges.join(du, "u").join(dv, "v")
    # orient from (deg, id)-smaller to larger: a total order, so the
    # oriented graph is a DAG and every triangle has exactly one
    # out-degree-2 source node.
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).localCheckpoint()

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # each unordered out-neighbor pair once: order by the SAME
    # (degree, id) comparator used for orientation, so the closing edge
    # is stored exactly as (lo, hi).
    wedges = (
        e1.join(e2, F.col("e1.src") == F.col("e2.src"))
        .filter(
            (F.col("e1.ddst") < F.col("e2.ddst"))
            | (
                (F.col("e1.ddst") == F.col("e2.ddst"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        )
        .select(F.col("e1.dst").alias("w_src"), F.col("e2.dst").alias("w_dst"))
    )
    closing = oriented.select(
        F.col("src").alias("w_src"), F.col("dst").alias("w_dst")
    )
    tri = wedges.join(closing, ["w_src", "w_dst"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    ne = oriented.agg(F.count(F.lit(1)).alias("n_edges"))
    nn = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    # three 1-row aggregates — crossJoin composes them lazily into one
    # DataFrame (no driver-side collect in the plan itself)
    return nn.crossJoin(ne).crossJoin(tri)
