"""Partitioning-control tests: plan-level evidence that the hints do
what the reference's partitioning classes did (SURVEY §1.3 mapping),
plus distributed linear algebra (gemm path, reference §2.7/§4.3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hpat_jl_spark.operators.partitioning import (
    coalesce_small,
    partition_by_key,
    partition_by_range,
    replicate,
)
from hpat_jl_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_by_key_enables_exchange_reuse(spark):
    li = load_table(spark, "lineitem", SF)
    pre = partition_by_key(li, "l_orderkey", n=8)
    agg = pre.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    # the groupBy reuses the repartition exchange: exactly one exchange
    plan = _plan(agg)
    assert plan.count("Exchange") == 1


def test_partition_by_range_plans_range_partitioning(spark):
    orders = load_table(spark, "orders", SF)
    ranged = partition_by_range(orders, "o_orderdate", n=4)
    assert "rangepartitioning(o_orderdate" in _plan(ranged)


def test_replicate_forces_broadcast(spark):
    region = load_table(spark, "region", SF)
    nation = load_table(spark, "nation", SF)
    j = nation.join(replicate(region), nation.n_regionkey == region.r_regionkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_coalesce_controls_output_partitions(spark):
    li = load_table(spark, "lineitem", SF).repartition(8)
    assert coalesce_small(li, 2).rdd.getNumPartitions() == 2


def test_distributed_gram_matrix(spark):
    """X'X via mllib RowMatrix (the reference's gemm+Allreduce pattern,
    src/distributed-pass.jl:699-739: local gemm per rank + MPI_Allreduce
    → Spark: per-partition gram + treeAggregate) equals numpy."""
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import RowMatrix

    emb = load_table(spark, "embeddings", SF).limit(100)
    rows = [np.array(r.embedding, dtype=np.float64) for r in emb.collect()]
    X = np.vstack(rows)
    mat = RowMatrix(
        spark.sparkContext.parallelize([Vectors.dense(r) for r in rows], 4)
    )
    gram = mat.computeGramianMatrix().toArray()
    np.testing.assert_allclose(gram, X.T @ X, rtol=1e-8)


def test_zorder_narrows_both_columns_file_ranges(spark, tmp_path):
    """Z-order layout: per-file min/max ranges narrow on BOTH
    dimensions — measured against the single-column-sort baseline,
    which clusters its own column but leaves the other at full span."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from hpat_jl_spark.operators.partitioning import zorder_sort

    rng = np.random.default_rng(11)
    rows = [(float(x), float(y)) for x, y in rng.uniform(0, 1000, (20000, 2))]
    df = spark.createDataFrame(rows, "x double, y double")

    def file_spans(path):
        sx, sy = [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            stats = [
                (md.row_group(i).column(j).statistics)
                for i in range(md.num_row_groups)
                for j in (0, 1)
            ]
            xs = [s for k, s in enumerate(stats) if k % 2 == 0]
            ys = [s for k, s in enumerate(stats) if k % 2 == 1]
            sx.append(max(s.max for s in xs) - min(s.min for s in xs))
            sy.append(max(s.max for s in ys) - min(s.min for s in ys))
        return sum(sx) / len(sx), sum(sy) / len(sy)

    z_out = str(tmp_path / "zordered")
    zorder_sort(df, ["x", "y"], bits=10, num_partitions=16).write.mode(
        "overwrite"
    ).parquet(z_out)
    zx, zy = file_spans(z_out)

    x_out = str(tmp_path / "xsorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(x_out)
    bx, by = file_spans(x_out)

    # x-sort baseline: tight on x, full-domain on y
    assert bx < 150 and by > 800
    # z-order: meaningfully tight on BOTH axes (16 curve chunks over a
    # 1000x1000 domain -> sub-rectangles)
    assert zx < 0.6 * by and zy < 0.6 * by, (zx, zy, by)
