"""Null-semantics goldens — a DELIBERATE divergence from the reference
(SURVEY §2.2: the reference has no NULLs and fakes them with
`> typemin(Int32)` sentinels; this engine uses real SQL null semantics).
These tests pin the behaviors a reference user must know when porting:
null join keys never match, aggregates skip nulls, countDistinct
excludes null, filters drop null comparisons, vcat preserves nulls.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark.operators.relational import aggregate, join, table_filter


def _with_nulls(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 30.0), (2, 20.0), (None, None)],
        "k long, v double",
    )


def test_null_join_keys_never_match(spark):
    t = _with_nulls(spark)
    other = spark.createDataFrame([(1, "a"), (None, "n")], "k long, tag string")
    out = join(t, other, "k", "k", "k")
    # only k=1 matches; the two null-key rows on the left and the
    # null-key row on the right never pair (SQL semantics)
    assert [(r.k, r.tag) for r in out.collect()] == [(1, "a")]


def test_aggregates_skip_nulls(spark):
    t = _with_nulls(spark)
    out = {
        r.k: (r.s, r.c_v, r.c_star)
        for r in aggregate(
            t,
            "k",
            [
                ("s", F.sum("v")),
                ("c_v", F.count("v")),        # counts non-null v only
                ("c_star", F.count(F.lit(1))),  # counts rows
            ],
        ).collect()
    }
    assert out[2] == (20.0, 1, 2)       # null v skipped by sum/count(v)
    assert out[None] == (30.0, 1, 2)    # null IS a group key in groupBy
    assert out[1] == (10.0, 1, 1)


def test_count_distinct_excludes_null(spark):
    t = spark.createDataFrame(
        [(1, "x"), (1, None), (1, "y"), (1, "x")], "k long, s string"
    )
    out = t.groupBy("k").agg(F.countDistinct("s").alias("d")).collect()[0]
    assert out.d == 2  # null not counted


def test_filter_drops_null_comparisons(spark):
    t = _with_nulls(spark)
    # v > 15 is NULL for null v → row dropped (three-valued logic),
    # exactly what the reference's sentinel hack approximated
    out = table_filter(t, F.col("v") > 15.0)
    assert sorted((r.k, r.v) for r in out.collect() if r.k is not None) == [
        (2, 20.0)
    ]
    assert out.count() == 2  # (None, 30.0) also passes

    # explicit IS NOT NULL is the ported form of `> typemin(Int32)`
    assert table_filter(t, F.col("v").isNotNull()).count() == 3


def test_null_safe_join_keeps_null_group(spark):
    """eqNullSafe joins the NULL bucket; a plain equi-join drops it."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("a", 1), (None, 2)], ["k", "x"])
    right = spark.createDataFrame([("a", 10), (None, 20)], ["k", "y"])
    l, r = left.alias("l"), right.alias("r")
    plain = l.join(r, F.col("l.k") == F.col("r.k")).count()
    safe = l.join(r, F.col("l.k").eqNullSafe(F.col("r.k"))).count()
    assert plain == 1 and safe == 2
