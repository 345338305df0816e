"""Property-based test: the distributed as-of join must agree with
pandas.merge_asof (the de-facto reference implementation) on arbitrary
generated inputs — groups, duplicate timestamps across groups, empty
sides, unmatched rows.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpat_jl_spark.operators.asof import asof_join

row_strategy = st.tuples(
    st.integers(min_value=0, max_value=3),        # group key
    st.integers(min_value=0, max_value=10_000),   # time (seconds)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(row_strategy, min_size=1, max_size=25),
    right_rows=st.lists(row_strategy, min_size=0, max_size=25),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_pd = pd.DataFrame(
        [
            {"lid": i, "uid": g, "ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t)}
            for i, (g, t) in enumerate(left_rows)
        ]
    )
    right_pd = pd.DataFrame(
        [
            {"uid": g, "ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t), "px": float(i)}
            for i, (g, t) in enumerate(right_rows)
        ],
        columns=["uid", "ts", "px"],
    )
    # pandas reference: backward inclusive, by group
    if len(right_pd):
        expected = pd.merge_asof(
            left_pd.sort_values("ts", kind="stable"),
            right_pd.sort_values(["ts", "px"], kind="stable"),
            on="ts",
            by="uid",
            direction="backward",
        )
        exp = {int(r.lid): (None if pd.isna(r.px) else r.px) for r in expected.itertuples()}
    else:
        exp = {int(r.lid): None for r in left_pd.itertuples()}

    left = spark.createDataFrame(left_pd, "lid long, uid long, ts timestamp")
    right = (
        spark.createDataFrame(right_pd, "uid long, ts timestamp, px double")
        if len(right_pd)
        else spark.createDataFrame([], "uid long, ts timestamp, px double")
    )
    got = {
        r.lid: r.right_px
        for r in asof_join(left, right, on="ts", by="uid",
                           right_value_cols=["px"]).collect()
    }
    # duplicate right timestamps within a group make the matched px
    # ambiguous in both systems; compare only unambiguous rows
    dup_keys = (
        right_pd.groupby(["uid", "ts"]).size()
        if len(right_pd)
        else pd.Series(dtype=int)
    )
    ambiguous = {k for k, n in dup_keys.items() if n > 1}

    def is_ambiguous(lid: int) -> bool:
        row = left_pd[left_pd.lid == lid].iloc[0]
        if not len(right_pd):
            return False
        prior = right_pd[(right_pd.uid == row.uid) & (right_pd.ts <= row.ts)]
        if not len(prior):
            return False
        last_ts = prior.ts.max()
        return (row.uid, last_ts) in ambiguous

    for lid, expected_px in exp.items():
        if is_ambiguous(lid):
            continue
        assert got[lid] == pytest.approx(expected_px) if expected_px is not None else got[lid] is None, (
            f"lid={lid}: got {got[lid]}, expected {expected_px}"
        )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=60,
    ),
    chunks=st.integers(2, 9),
)
def test_cumsum_chunked_property(spark, vals, chunks):
    """cumsum_chunked must equal the single-window global cumsum for
    arbitrary value/NULL sequences and any chunk count — including
    NULL-prefix rows (stay NULL) and all-NULL chunks."""
    from hpat_jl_spark.operators.windowed import cumsum, cumsum_chunked

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v double")
    want = {r.i: r.c for r in cumsum(df, "v", "i", "c").collect()}
    got = {
        r.i: r.c
        for r in cumsum_chunked(df, "v", "i", "c", num_chunks=chunks).collect()
    }
    assert set(got) == set(want)
    for k in want:
        a, b = got[k], want[k]
        if a is None or b is None:
            assert a is None and b is None, (k, a, b)
        else:
            assert abs(a - b) < 1e-9, (k, a, b)
