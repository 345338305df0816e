"""Planted-data semantics for the temporal plan layer's gaps-and-islands
streak query (the sf0.01 sweep hash-checks the fixture result against
DuckDB; here the island arithmetic is pinned on hand-built rows).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpat_jl_spark import registry
from hpat_jl_spark.registry import REGISTRY
from tests.conftest import SF_SMOKE

registry.load_all_plans()


def _streaks(spark, rows):
    """The plan's island kernel on explicit (user_id, day) rows —
    mirrors plans/temporal.activity_streaks after the distinct."""
    days = spark.createDataFrame(rows, "user_id long, day date").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
        .select("user_id", "streak_days", "streak_start", "streak_end")
    )


def test_streak_islands_golden(spark):
    d = dt.date
    rows = [
        # user 1: 3-day run, 1-day gap, 2-day run
        (1, d(2024, 1, 1)), (1, d(2024, 1, 2)), (1, d(2024, 1, 3)),
        (1, d(2024, 1, 5)), (1, d(2024, 1, 6)),
        # user 2: single day (streak of 1)
        (2, d(2024, 3, 10)),
        # user 3: duplicate events same day collapse before the window
        (3, d(2024, 2, 1)), (3, d(2024, 2, 1)), (3, d(2024, 2, 2)),
    ]
    got = {
        (r.user_id, r.streak_start): (r.streak_days, r.streak_end)
        for r in _streaks(spark, rows).collect()
    }
    assert got == {
        (1, d(2024, 1, 1)): (3, d(2024, 1, 3)),
        (1, d(2024, 1, 5)): (2, d(2024, 1, 6)),
        (2, d(2024, 3, 10)): (1, d(2024, 3, 10)),
        (3, d(2024, 2, 1)): (2, d(2024, 2, 2)),
    }


def test_activity_streaks_fixture_invariants(spark):
    rows = REGISTRY["activity_streaks"].fn(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    lens = [r.streak_days for r in rows]
    assert lens == sorted(lens, reverse=True)
    for r in rows:
        # an island spans exactly its day count
        assert (r.streak_end - r.streak_start).days == r.streak_days - 1


def test_sax_multidigit_segments_match_across_users(spark):
    """ADVICE r03 hardening pin: >50-day windows produce multi-digit
    (relative) segment numbers; the %04d-padded word must still compare
    identical-shape users equal and different-shape users unequal —
    lexicographic sort_array == numeric seg order by construction."""
    import datetime as dt

    from hpat_jl_spark.plans.temporal import _sax_candidates

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2):  # identical 70-day shapes -> must be candidates
        for d in range(0, 70, 5):
            rows.append((u, base + dt.timedelta(days=d), float(d % 3)))
    for d in range(0, 70, 5):  # flat series -> different word
        rows.append((3, base + dt.timedelta(days=d), 1.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r.user_a, r.user_b): r.paa_dist for r in _sax_candidates(df).collect()}
    assert got == {(1, 2): 0.0}
