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
    """Z-order layout: after writing the Z-sorted frame, per-file
    min/max ranges must be narrow for BOTH dimensions (vs the full
    domain), so filters on either column prune files. A single-column
    sort can't do this for the second column."""
    import numpy as np

    from hpat_jl_spark.operators.partitioning import zorder_sort

    rng = np.random.default_rng(11)
    rows = [(float(x), float(y)) for x, y in rng.uniform(0, 1000, (20000, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    out = str(tmp_path / "zordered")
    zorder_sort(df, ["x", "y"], bits=10).write.mode("overwrite").parquet(out)

    import glob

    import pyarrow.parquet as pq

    spans_x, spans_y = [], []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.read_metadata(f)
        lo_x = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi_x = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        lo_y = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi_y = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_x.append(hi_x - lo_x)
        spans_y.append(hi_y - lo_y)
    assert len(spans_x) >= 2
    # each file covers a sub-square of the domain: mean span well under
    # the full 1000-range on BOTH axes
    assert sum(spans_x) / len(spans_x) < 700, spans_x
    assert sum(spans_y) / len(spans_y) < 700, spans_y
