"""Count-min sketch semantics (functions/sketches.py): the one-sided
error guarantee under FORCED collisions, exactness when width exceeds
the keyspace, mergeability-by-partial-agg, and the fixture query's
collision-free claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpat_jl_spark.functions import sketches as SK
from hpat_jl_spark.registry import REGISTRY
from hpat_jl_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all_plans()


def _tokens(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "t string")


def test_cms_never_underestimates(spark):
    """The defining CMS guarantee: est >= true, even at width 2 where
    collisions are unavoidable (16 keys into 2 buckets per row)."""
    counts = {f"tok{i}": i + 1 for i in range(16)}
    df = _tokens(spark, counts)
    sk = SK.cms_build(df, "t", depth=4, width=2)
    items = spark.createDataFrame([(t,) for t in counts], "t string")
    est = {r.t: r.est_count for r in SK.cms_estimate(sk, items, "t", depth=4, width=2).collect()}
    n_total = sum(counts.values())
    for t, true in counts.items():
        assert est[t] >= true
        assert est[t] <= n_total  # a cell can never exceed the stream length


def test_cms_exact_when_width_exceeds_keyspace(spark):
    """With width far above the key count, every estimate should come
    back exact (no full-depth collision among a handful of keys)."""
    counts = {"a": 5, "b": 3, "c": 11, "d": 1}
    df = _tokens(spark, counts)
    sk = SK.cms_build(df, "t", depth=4, width=1024)
    items = spark.createDataFrame([(t,) for t in counts], "t string")
    est = {r.t: r.est_count for r in SK.cms_estimate(sk, items, "t", depth=4, width=1024).collect()}
    assert est == {t: n for t, n in counts.items()}


def test_cms_state_is_bounded(spark):
    """The sketch table never exceeds depth×width rows no matter the
    input size — the property that makes it a sketch."""
    counts = {f"k{i}": 3 for i in range(200)}
    sk = SK.cms_build(_tokens(spark, counts), "t", depth=3, width=8)
    assert sk.count() <= 3 * 8


def test_cms_unseen_item_estimates_small(spark):
    """An item never inserted estimates 0 at generous width (and can
    only be a collision overcount, never negative)."""
    sk = SK.cms_build(_tokens(spark, {"x": 7}), "t", depth=4, width=1024)
    items = spark.createDataFrame([("never-seen",)], "t string")
    [r] = SK.cms_estimate(sk, items, "t", depth=4, width=1024).collect()
    assert r.est_count == 0


def test_cms_fixture_query_collision_free(spark):
    """cms_heavy_hitters' oracle asserts est == exact; verify the
    premise (31-token fixture vocabulary, width 1024) on EVERY token,
    not just the query's top-10."""
    from hpat_jl_spark.tables import load_table

    docs = load_table(spark, "documents", SF_SMOKE)
    tok = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    sk = SK.cms_build(tok, "token", depth=4, width=1024)
    exact = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    est = SK.cms_estimate(sk, exact.select("token"), "token", depth=4, width=1024)
    bad = (
        exact.join(est, "token")
        .filter(F.col("est_count") != F.col("true_count"))
        .count()
    )
    assert bad == 0
