"""Source/sink roundtrip tests (SURVEY §2.1 parity): parquet and csv
write→read roundtrips preserve data; hive partitioning prunes; schema'd
csv read (TXT-source equivalent) parses exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hpat_jl_spark.sources import read_csv, read_parquet, write_csv, write_parquet
from hpat_jl_spark.tables import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


def test_parquet_roundtrip(spark, tmp_path):
    li = load_table(spark, "lineitem", SF)
    path = str(tmp_path / "li")
    write_parquet(li, path)
    back = read_parquet(spark, path)
    assert back.count() == li.count()
    assert back.schema == li.schema


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, "lineitem", SF)
    path = str(tmp_path / "li_part")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = read_parquet(spark, path).filter(F.col("l_returnflag") == "R")
    expected = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == expected
    # partition pruning visible in the physical plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_roundtrip(spark, tmp_path):
    cust = load_table(spark, "customer", SF)
    path = str(tmp_path / "cust_csv")
    write_csv(cust, path)
    back = read_csv(spark, path, SCHEMAS["customer"])
    assert back.count() == cust.count()
    a = sorted(tuple(r) for r in cust.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_json_roundtrip(spark, tmp_path):
    from hpat_jl_spark.sources.io import read_json, write_json

    cust = load_table(spark, "customer", SF)
    path = str(tmp_path / "cust_json")
    write_json(cust, path)
    back = read_json(spark, path, SCHEMAS["customer"])
    assert back.count() == cust.count()
    a = sorted(tuple(r) for r in cust.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from hpat_jl_spark.sources.io import compact_parquet

    li = load_table(spark, "lineitem", SF)
    fragmented = str(tmp_path / "fragmented")
    li.repartition(40).write.parquet(fragmented)  # 40 tiny files
    compacted = str(tmp_path / "compacted")
    n = compact_parquet(spark, fragmented, compacted, target_file_bytes=1 << 30)
    assert n == 1
    import glob

    files = glob.glob(f"{compacted}/part-*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(compacted).count() == li.count()


def test_load_table_bad_dir_raises_with_path(spark):
    import pytest
    from pyspark.errors import AnalysisException

    from hpat_jl_spark.tables import load_table

    with pytest.raises(AnalysisException, match="no/such/dir"):
        load_table(spark, "lineitem", "/no/such/dir").count()


def test_schema_diff_detects_drift(spark, tmp_path):
    from hpat_jl_spark.sources.io import schema_diff

    a = str(tmp_path / "snap_a")
    b = str(tmp_path / "snap_b")
    df = load_table(spark, "supplier", SF)
    df.write.parquet(a)
    (
        df.drop("s_acctbal")
        .withColumn("s_region", F.lit("x"))
        .withColumn("s_nationkey", F.col("s_nationkey").cast("long"))
        .write.parquet(b)
    )
    d = schema_diff(spark, a, b)
    assert d["added"] == ["s_region"]
    assert d["removed"] == ["s_acctbal"]
    assert d["retyped"] == ["s_nationkey: int -> bigint"]


def test_orc_roundtrip(spark, tmp_path):
    """ORC write→read preserves data and schema; predicate pushdown
    reaches the ORC scan (PushedFilters), same as parquet."""
    from hpat_jl_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, "c", 0.25)],
        "id long, name string, v double",
    )
    p = str(tmp_path / "t.orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    plan = (
        read_orc(spark, p)
        .filter("id > 1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan


def test_text_lines_roundtrip(spark, tmp_path):
    """Raw line source/sink (the reference's TXT byte-range reader
    analogue): lines survive a write→read roundtrip, order-insensitive
    (tasks write per-partition files)."""
    from pyspark.sql import functions as F

    from hpat_jl_spark.sources.io import read_text_lines, write_text_lines

    lines = ["first line", "second line", "third"]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    p = str(tmp_path / "lines.txt")
    write_text_lines(df, p)
    back = read_text_lines(spark, p)
    assert sorted(r.value for r in back.collect()) == sorted(lines)
