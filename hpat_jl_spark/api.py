"""HPAT-surface facade: the reference's user-facing API, one function
per construct, so a reference user can port a query mechanically.

Reference surface (README.md:109-116; src/capture-api.jl):

    t1 = DataSource(DataTable{:userid=Int64, :val2=Float64}, HDF5, f)
    t2 = t1[:userid > 2]
    t3 = join(t1, t2, :userid == :userid, :userid)
    t4 = aggregate(t1, :userid, :s = sum(:val2), :c = length(:val2))
    t5 = [t2; t3]
    DataSink(t5, HDF5, "/out", f)

This module's mapping (each is a thin delegation — the engine is the
DataFrame API; see operators/relational.py for semantics and physical
notes):

    t1 = data_source(spark, {"userid": "long", "val2": "double"}, "parquet", path)
    t2 = t1[t1.userid > 2]                    # native DataFrame getitem
    t3 = join(t1, t2, "userid", "userid", "userid")
    t4 = aggregate(t1, "userid", s=F.sum("val2"), c=F.count(F.lit(1)))
    t5 = vcat(t2, t3)
    data_sink(t5, "parquet", out_path)

Column expressions use pyspark.sql.functions (`F.*`) — the open
equivalent of the reference's compiled Julia closures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hpat_jl_spark.operators.relational import (
    aggregate as _aggregate,
)
from hpat_jl_spark.operators.relational import (
    join as _join,
)
from hpat_jl_spark.operators.relational import (
    table_filter,
    table_vcat,
)

_TYPE_ALIASES = {
    "Int64": "long",
    "Int32": "int",
    "Float64": "double",
    "Float32": "float",
    "Bool": "boolean",
    "ASCIIString": "string",  # the reference's aspirational string type
}


def data_source(
    spark: SparkSession,
    schema: dict[str, str],
    fmt: str,
    path: str,
) -> DataFrame:
    """`DataSource(DataTable{...}, HDF5|TXT, file)` → schema'd read.

    ``schema`` maps column name → type name; reference Julia type names
    (Int64/Float64/...) are accepted. fmt: 'parquet' (HDF5 analogue) or
    'csv' (TXT analogue)."""
    fields = [
        T.StructField(name, _parse_type(t)) for name, t in schema.items()
    ]
    st = T.StructType(fields)
    if fmt == "parquet":
        df = spark.read.parquet(path)
        # verify the declared schema matches (reference semantics:
        # declaration is authoritative, mismatch is an error)
        declared = {f.name for f in fields}
        actual = set(df.columns)
        if not declared <= actual:
            raise ValueError(
                f"declared columns {sorted(declared - actual)} absent from {path}"
            )
        # Types are authoritative too (ADVICE r01: name-only checking let
        # a declared Float64 silently read an int32 file column). Numeric
        # ↔ numeric differences are CAST to the declaration — the
        # reference program's arithmetic then behaves as written — while
        # cross-kind mismatches (string file column declared numeric,
        # etc.) are errors, not silent coercions.
        file_types = dict(df.dtypes)
        out = []
        for f in fields:
            fty = file_types[f.name]
            dty = f.dataType.simpleString()
            if fty == dty:
                out.append(F.col(f.name))
                continue
            numerics = {"tinyint", "smallint", "int", "bigint", "float", "double"}
            if fty in numerics and dty in numerics:
                out.append(F.col(f.name).cast(f.dataType).alias(f.name))
                continue
            raise TypeError(
                f"column {f.name!r}: declared {dty} but {path} stores {fty}"
            )
        return df.select(*out)
    if fmt == "csv":
        return spark.read.schema(st).csv(path, header=True)
    if fmt == "json":
        return spark.read.schema(st).json(path)
    raise ValueError(f"unknown format {fmt!r} (parquet|csv|json)")


def _parse_type(name: str) -> T.DataType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(_TYPE_ALIASES.get(name, name))


def data_sink(t: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    """`DataSink(y, HDF5|TXT, file)` → parquet/csv write."""
    if fmt == "parquet":
        t.write.mode(mode).parquet(path)
    elif fmt == "csv":
        t.write.mode(mode).option("header", "true").csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r} (parquet|csv)")


def filter(t: DataFrame, cond: Column | str) -> DataFrame:  # noqa: A001
    """`t[cond]` — also available natively as ``t[cond]`` on any
    DataFrame."""
    return table_filter(t, cond)


def join(
    t1: DataFrame, t2: DataFrame, k1: str, k2: str, out_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """`join(t1, t2, :k1==:k2, :out)` — inner equi-join, duplicate keys
    multiply, output key renamed (reference src/capture-api.jl:286-378)."""
    return _join(t1, t2, k1, k2, out_key, how=how)


def aggregate(t: DataFrame, key: str, _key_alias: str | None = None, **aggs: Column) -> DataFrame:
    """`aggregate(t, :key, :out1 = f(expr), ...)` with kwargs as the
    named output columns; optional ``_key_alias`` is the reference's
    key-rename (`:cid = :ss_customer_sk`)."""
    return _aggregate(t, key, list(aggs.items()), key_alias=_key_alias)


def vcat(*tables: DataFrame) -> DataFrame:
    """`[t1; t2]` — UNION ALL with schema matching by name."""
    return table_vcat(*tables)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every fixture table as a temp view so `sql()` queries
    can name them — the open SQL entry point the reference never had
    (its only entry is the `@acc hpat` macro; SURVEY §3)."""
    from hpat_jl_spark.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return list(TABLE_NAMES)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run ANSI SQL against the registered views (registering them
    first when ``sf_dir`` is given). Same Catalyst plans as the
    DataFrame surface — `spark.sql` and DataFrame calls are two
    frontends to one optimizer, so everything in PLANS.md applies."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)


def stencil(t: DataFrame, value: str, order_by: str) -> DataFrame:
    """`stencil(x->(x[-1]+2x[0]+x[1])/4, t[:col])` (reference
    src/capture-api.jl:111-144) — 3-point smoothing with boundary
    pass-through; DataFrames are unordered so the ordering column is
    explicit (SURVEY §7)."""
    from hpat_jl_spark.operators.windowed import stencil_3pt

    return stencil_3pt(t, value, order_by)


def cumsum(t: DataFrame, value: str, order_by: str) -> DataFrame:
    """`cumsum(t[:col])` (reference dist_cumsum!, src/distributed-pass
    .jl:1213-1215) — running sum in explicit order; see
    operators/windowed.cumsum_chunked for the global-scale path."""
    from hpat_jl_spark.operators.windowed import cumsum as _cumsum

    return _cumsum(t, value, order_by)
