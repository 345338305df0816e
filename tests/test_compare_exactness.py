"""compare_frames must certify what the driver's value hash measures
(VERDICT r08 #2): float columns compare EXACTLY by default — the old
rel_tol=1e-7 path let q11's one-cent divergence (1.5e-8 on a 6-digit
value) read green for 7 rounds. The tolerant path survives only for
columns a query explicitly tags ``float_tol``."""

from __future__ import annotations

import math

import pandas as pd

from hpat_jl_spark.registry import REGISTRY, load_all_plans
from hpat_jl_spark.testing import compare_frames


def test_one_cent_divergence_fails_exact_compare():
    # q11's actual r8 failure shape: 660703.16 vs 660703.17
    a = pd.DataFrame({"k": [138, 1568], "value": [660703.16, 376409.23]})
    e = pd.DataFrame({"k": [138, 1568], "value": [660703.17, 376409.22]})
    problems = compare_frames(a, e)
    assert problems and "exact float compare" in problems[0]


def test_exact_equal_floats_pass():
    a = pd.DataFrame({"k": [1], "value": [660703.16]})
    assert compare_frames(a, a.copy()) == []


def test_nan_equals_nan_in_exact_mode():
    a = pd.DataFrame({"v": [float("nan"), 1.5]})
    assert compare_frames(a, a.copy()) == []


def test_float_tol_tag_restores_tolerant_compare():
    a = pd.DataFrame({"v": [1.0000000001]})
    e = pd.DataFrame({"v": [1.0]})
    assert compare_frames(a, e) != []  # exact: fails
    assert compare_frames(a, e, float_tol=("v",)) == []  # tagged: passes
    # but a tagged column still fails beyond the tolerance
    e2 = pd.DataFrame({"v": [1.01]})
    bad = compare_frames(a, e2, float_tol=("v",))
    assert bad and "tolerant float compare" in bad[0]


def test_tolerant_sort_canonicalization_only_for_tagged_columns():
    # near-equal tagged values must land in the same row order on both
    # sides (the round(9) quantize) — untagged columns sort raw
    a = pd.DataFrame({"v": [1.0 + 1e-12, 2.0]})
    e = pd.DataFrame({"v": [2.0, 1.0]})
    assert compare_frames(a, e, float_tol=("v",)) == []


def test_no_registered_query_tags_float_tol_by_default():
    """Every float_tol tag is a documented driver-hash RISK; the r9
    audit proved the whole registry exact-safe at all three fixture
    scales with ZERO tags. A new tag must be a deliberate, reviewed
    exception — update this count (and COVERAGE.md) if one lands."""
    load_all_plans()
    tagged = sorted(n for n, s in REGISTRY.items() if s.float_tol)
    assert tagged == [], f"unexpected float_tol tags: {tagged}"
