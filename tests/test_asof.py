"""Golden tests for the as-of join and banded range join operators
(operators/asof.py) — hand-built inputs covering: exact-tie matching
(inclusive), no-prior-match nulls, tolerance expiry, duplicate-key
groups, and banded-range pair completeness at band borders.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.operators.asof import asof_join, banded_range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),   # matches right@10 (tie, inclusive)
            (2, 1, _ts(25)),   # matches right@20
            (3, 1, _ts(5)),    # no prior right row → null
            (4, 2, _ts(30)),   # matches right@7 (other group)
        ],
        "lid long, uid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100.0),
            (1, _ts(20), 200.0),
            (2, _ts(7), 700.0),
        ],
        "uid long, ts timestamp, px double",
    )
    return left, right


def test_asof_backward_inclusive(frames):
    left, right = frames
    out = {
        r.lid: (r.right_px, r.right_ts)
        for r in asof_join(left, right, on="ts", by="uid",
                           right_value_cols=["px"]).collect()
    }
    assert out[1] == (100.0, _ts(10))  # tie matches
    assert out[2] == (200.0, _ts(20))  # latest prior, not first
    assert out[3] == (None, None)      # nothing prior
    assert out[4] == (700.0, _ts(7))   # group isolation


def test_asof_tolerance(frames):
    left, right = frames
    out = {
        r.lid: r.right_px
        for r in asof_join(
            left, right, on="ts", by="uid",
            right_value_cols=["px"], tolerance_seconds=5,
        ).collect()
    }
    assert out[1] == 100.0   # 0s gap within tolerance
    assert out[2] == 200.0   # 5s gap, inclusive
    assert out[4] is None    # 23s gap → expired


def test_banded_range_join_border_pairs(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 100.0), (3, 250.0)], "lid long, lv double"
    )
    right = spark.createDataFrame(
        [(10, 100.0), (11, 199.9), (12, 350.1)], "rid long, rv double"
    )
    out = sorted(
        (r.lid, r.rid)
        for r in banded_range_join(left, right, "lv", "rv", 100.0).collect()
    )
    # |0-100|<=100 ✓(border), |100-100| ✓, |100-199.9| ✓, |250-199.9| ✓,
    # |250-350.1| ✗ (100.1), |0-199.9| ✗
    assert out == [(1, 10), (2, 10), (2, 11), (3, 11)]
    # no duplicate pairs from neighbor-bucket replication
    assert len(out) == len(set(out))
