"""Planted goldens for the round-3 statistical operators (KS test, JS
divergence, SAX candidates) with hand-computed expected values, staged
under the declared fixture schemas and run through the registered query
functions — the driver-gate code path."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta

import pytest

from hpat_jl_spark import registry

registry.load_all_plans()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


class TestKsTest:
    def test_hand_computed_statistic(self, spark, tmp_path):
        """purchases {1,3}, views {2,4}: ECDF gaps at distinct values
        are .5, 0, .5, 0 → KS = 0.5."""
        t0 = datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "purchase", 1.0, "{}"),
            (2, t0, 1, "purchase", 3.0, "{}"),
            (3, t0, 1, "view", 2.0, "{}"),
            (4, t0, 1, "view", 4.0, "{}"),
        ]
        d = _write(spark, tmp_path, "events", rows, EVENT_SCHEMA)
        out = registry.REGISTRY["ks_test_purchase_view"].fn(spark, d).collect()
        assert len(out) == 1
        assert (out[0].n1, out[0].n2) == (2, 2)
        assert out[0].ks_stat == pytest.approx(0.5, abs=1e-9)

    def test_identical_samples_zero(self, spark, tmp_path):
        t0 = datetime(2024, 1, 1)
        rows = []
        for i, v in enumerate([1.0, 2.0, 5.0]):
            rows.append((i, t0, 1, "purchase", v, "{}"))
            rows.append((100 + i, t0, 1, "view", v, "{}"))
        d = _write(spark, tmp_path, "events", rows, EVENT_SCHEMA)
        out = registry.REGISTRY["ks_test_purchase_view"].fn(spark, d).collect()
        assert out[0].ks_stat == pytest.approx(0.0, abs=1e-9)


class TestJsDivergence:
    def test_identical_sources_zero(self, spark, tmp_path):
        rows = [
            (1, "alpha beta gamma", "en", "s1", 10),
            (2, "alpha beta gamma", "en", "s2", 10),
        ]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        out = registry.REGISTRY["js_divergence_sources"].fn(spark, d).collect()
        assert len(out) == 1
        assert out[0].js_divergence == pytest.approx(0.0, abs=1e-9)

    def test_disjoint_sources_ln2(self, spark, tmp_path):
        """Disjoint vocabularies → JSD = ln 2 (max for natural log)."""
        rows = [
            (1, "alpha beta", "en", "s1", 10),
            (2, "gamma delta", "en", "s2", 10),
        ]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        out = registry.REGISTRY["js_divergence_sources"].fn(spark, d).collect()
        assert out[0].js_divergence == pytest.approx(math.log(2.0), abs=1e-6)

    def test_pair_count(self, spark, tmp_path):
        rows = [(i, "tok common", "en", f"s{i % 3}", 10) for i in range(9)]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        out = registry.REGISTRY["js_divergence_sources"].fn(spark, d).collect()
        assert len(out) == 3  # C(3,2)


class TestSaxCandidates:
    def _events(self, user, day_values, base=0):
        t0 = datetime(2024, 1, 1)
        return [
            (base + i, t0 + timedelta(days=day), user, "view", v, "{}")
            for i, (day, v) in enumerate(day_values)
        ]

    def test_identical_series_are_candidates(self, spark, tmp_path):
        """Users 1 and 2 share an increasing series (same rank word,
        distance 0); user 3's series is inverted (different word)."""
        shape = [(d, float(d)) for d in range(0, 30, 2)]
        inverted = [(d, float(30 - d)) for d in range(0, 30, 2)]
        rows = (
            self._events(1, shape, 0)
            + self._events(2, shape, 1000)
            + self._events(3, inverted, 2000)
        )
        d = _write(spark, tmp_path, "events", rows, EVENT_SCHEMA)
        out = registry.REGISTRY["sax_similarity_candidates"].fn(spark, d).collect()
        pairs = {(r.user_a, r.user_b): r.paa_dist for r in out}
        assert pairs == {(1, 2): 0.0}
