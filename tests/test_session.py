"""session.scan_split_count: the job-free scan-parallelism estimate
(ADVICE r12) must agree with what Spark actually reports on a bare
scan wherever the row-group cap does not bind, and must be capped by
the parquet row-group count where it does (the r7 trap: byte-range
splits only yield rows where a row group starts).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from hpat_jl_spark.session import (
    _parse_jvm_bytes,
    scan_split_count,
    starved_scan_pin_width,
)
from hpat_jl_spark.tables import TABLE_NAMES, table_path


def test_parse_jvm_bytes():
    assert _parse_jvm_bytes("128MB") == 128 << 20
    assert _parse_jvm_bytes("4194304b") == 4 << 20
    assert _parse_jvm_bytes("1g") == 1 << 30
    assert _parse_jvm_bytes("512") == 512
    assert _parse_jvm_bytes(42) == 42
    assert _parse_jvm_bytes("2k") == 2048


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_scan_split_count_matches_spark(spark, sf_dir):
    """Against ground truth: min(reported partitions, row groups).
    The .rdd call is fine HERE (a test may plan); the production
    plan-construction path must not (the bench zero-jobs contract)."""
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        reported = spark.read.parquet(path).rdd.getNumPartitions()
        row_groups = pq.ParquetFile(path).metadata.num_row_groups
        assert scan_split_count(spark, path) == min(reported, row_groups), (
            name,
            sf_dir,
            reported,
            row_groups,
        )


def test_scan_split_count_tracks_conf(spark):
    """A probe that re-tunes maxPartitionBytes (scaling_probe stages
    do) must see the packing move in lockstep with Spark's."""
    path = table_path("/root/testdata/sf0.1", "lineitem")
    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    prev = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "262144b")  # 256 KB splits
        spark.conf.set(keys[1], "16384b")
        reported = spark.read.parquet(path).rdd.getNumPartitions()
        row_groups = pq.ParquetFile(path).metadata.num_row_groups
        assert scan_split_count(spark, path) == min(reported, row_groups)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_row_group_cap_fires_on_synthetic_single_group(spark, tmp_path):
    """A file whose byte size spans many splits but holds ONE row group
    must count as 1 (r7 trap) — the case the old
    .rdd.getNumPartitions() input overstated."""
    import pyarrow as pa

    f = str(tmp_path / "one_group.parquet")
    n = 200_000
    tbl = pa.table({"x": pa.array(range(n)), "s": pa.array(["y" * 40] * n)})
    pq.write_table(tbl, f, row_group_size=n)
    assert pq.ParquetFile(f).metadata.num_row_groups == 1
    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    prev = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "65536b")
        spark.conf.set(keys[1], "1024b")
        reported = spark.read.parquet(f).rdd.getNumPartitions()
        assert reported > 1  # Spark reports many byte-range partitions...
        assert scan_split_count(spark, f) == 1  # ...only one yields rows
        # and the pin decision flips to "starved", as it should
        assert starved_scan_pin_width(1, 32, 8) == 32
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
