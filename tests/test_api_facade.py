"""The HPAT-facade (api.py) replays the reference's README example
shapes end-to-end: data_source → getitem filter → join → aggregate →
vcat → data_sink, on real fixture files."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark import api

SF = "/root/testdata/sf0.001"


def test_readme_pipeline_shape(spark, tmp_path):
    # DataSource with reference-style type names
    orders = api.data_source(
        spark,
        {"o_orderkey": "Int64", "o_custkey": "Int64", "o_totalprice": "Float64"},
        "parquet",
        f"{SF}/orders.parquet",
    )
    assert orders.columns == ["o_orderkey", "o_custkey", "o_totalprice"]

    # native getitem filter (the reference's t1[cond])
    big = orders[orders.o_totalprice > 200000.0]
    assert big.count() == orders.filter("o_totalprice > 200000").count()

    # join with key rename
    customer = api.data_source(
        spark,
        {"c_custkey": "Int64", "c_acctbal": "Float64"},
        "parquet",
        f"{SF}/customer.parquet",
    )
    j = api.join(big, customer, "o_custkey", "c_custkey", "cid")
    assert j.columns[0] == "cid"

    # aggregate with kwargs + key rename
    agg = api.aggregate(
        j, "cid", _key_alias="customer",
        spend=F.round(F.sum("o_totalprice"), 2),
        n=F.count(F.lit(1)),
    )
    assert set(agg.columns) == {"customer", "spend", "n"}

    # vcat + sink roundtrip
    both = api.vcat(agg, agg)
    assert both.count() == 2 * agg.count()
    out = str(tmp_path / "out")
    api.data_sink(both, "parquet", out)
    assert spark.read.parquet(out).count() == both.count()


def test_data_source_missing_column_errors(spark):
    try:
        api.data_source(
            spark, {"nope": "Int64"}, "parquet", f"{SF}/orders.parquet"
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)


def test_facade_stencil_and_cumsum(spark):
    """Reference ordered-operator surface through the facade: golden
    values from the reference's stencil/cumsum tests
    (test/stencil_test1.jl boundary pass-through; cumsum monotone)."""
    from hpat_jl_spark import api

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1.2, 2.0, 3.0, 2.5, 1.9])],
        "i long, v double",
    )
    sm = {r.i: r.stencil for r in api.stencil(df, "v", "i").collect()}
    assert sm[0] == 1.2 and sm[4] == 1.9  # boundaries pass through
    assert abs(sm[1] - (1.2 + 2 * 2.0 + 3.0) / 4.0) < 1e-9
    cs = {r.i: r.cumsum for r in api.cumsum(df, "v", "i").collect()}
    assert abs(cs[4] - 10.6) < 1e-9


def test_data_source_types_are_authoritative(spark, tmp_path):
    """ADVICE r01: declared types must be enforced for parquet, not just
    names — numeric declarations CAST the file column, cross-kind
    mismatches raise."""
    import pytest

    p = str(tmp_path / "typed.parquet")
    spark.createDataFrame(
        [(1, 2.5, "x")], "a int, b double, c string"
    ).write.parquet(p)

    # numeric↔numeric: cast to the declaration (int32 file → Int64 decl)
    df = api.data_source(spark, {"a": "Int64", "b": "Float32"}, "parquet", p)
    assert dict(df.dtypes) == {"a": "bigint", "b": "float"}

    # cross-kind: string file column declared numeric is an error
    with pytest.raises(TypeError, match="declared bigint"):
        api.data_source(spark, {"c": "Int64"}, "parquet", p)
