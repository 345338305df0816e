"""Planted-data goldens for the round-3 operators (lang-ID, UDTF
chunking, as-of tolerance, repeat-pair connected components). Each test
stages a tiny fixture under the DECLARED table schema into a tmp dir and
runs the REGISTERED query function against it — the exact code path the
driver gate exercises, but with hand-computable answers.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hpat_jl_spark import registry

registry.load_all_plans()


def _write(spark, tmp_path, name: str, rows, schema: str) -> str:
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def _docs_row(doc_id, text, lang, source="s"):
    return (doc_id, text, lang, source, len(text))


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


class TestLangIdNgram:
    def test_planted_profiles_recovered(self, spark, tmp_path):
        """Two langs with disjoint character trigrams → every doc's
        predicted lang equals its label (diagonal confusion matrix)."""
        aa = "alpha beta gamma delta epsilon zeta"
        bb = "zulu yankee xray whiskey victor uniform"
        rows = [_docs_row(i, aa, "aa") for i in range(5)]
        rows += [_docs_row(10 + i, bb, "bb") for i in range(5)]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        out = registry.REGISTRY["lang_id_ngram"].fn(spark, d).collect()
        got = {(r.lang, r.predicted_lang): r.n for r in out}
        assert got == {("aa", "aa"): 5, ("bb", "bb"): 5}

    def test_short_docs_drop_out(self, spark, tmp_path):
        """Docs under 3 chars yield no trigrams and are excluded."""
        rows = [_docs_row(1, "ab", "aa"), _docs_row(2, "hello world", "aa")]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        out = registry.REGISTRY["lang_id_ngram"].fn(spark, d).collect()
        assert sum(r.n for r in out) == 1


class TestUdtfDocumentChunks:
    def test_chunk_boundaries(self, spark, tmp_path):
        """75 tokens → starts at 1 and 26; second window truncated to
        50 from position 26 (tokens 26..75)."""
        text = " ".join(f"t{i}" for i in range(75))
        d = _write(spark, tmp_path, "documents", [_docs_row(7, text, "en")],
                   DOC_SCHEMA)
        out = registry.REGISTRY["udtf_document_chunks"].fn(spark, d).collect()
        got = {r.chunk_start: r.n_chunk_tokens for r in out}
        assert got == {1: 50, 26: 50}

    def test_short_doc_single_chunk(self, spark, tmp_path):
        d = _write(spark, tmp_path, "documents",
                   [_docs_row(1, "a b c", "en")], DOC_SCHEMA)
        out = registry.REGISTRY["udtf_document_chunks"].fn(spark, d).collect()
        assert len(out) == 1 and out[0].n_chunk_tokens == 3

    def test_matches_jvm_chunker(self, spark, tmp_path):
        """UDTF output == document_chunks (JVM explode/slice) output."""
        rows = [
            _docs_row(i, " ".join(f"w{i}_{j}" for j in range(10 + 17 * i)), "en")
            for i in range(6)
        ]
        d = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
        a = registry.REGISTRY["udtf_document_chunks"].fn(spark, d)
        b = registry.REGISTRY["document_chunks"].fn(spark, d)
        cols = ["doc_id", "chunk_start", "n_chunk_tokens", "chunk_hash"]
        sa = sorted(map(tuple, a.select(*cols).collect()))
        sb = sorted((r[0], r[1], r[2], r[3]) for r in b.select(*cols).collect())
        assert sa == sb


EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


class TestAsofTolerance:
    @pytest.mark.parametrize(
        "gap_seconds,expect_match",
        [(599, True), (600, True), (601, False)],  # inclusive <= 600
    )
    def test_boundary_inclusive(self, spark, tmp_path, gap_seconds, expect_match):
        from datetime import datetime, timedelta

        p_ts = datetime(2024, 1, 1, 12, 0, 0)
        v_ts = p_ts - timedelta(seconds=gap_seconds)
        rows = [
            (1, v_ts, 42, "view", 5.0, "{}"),
            (2, p_ts, 42, "purchase", 9.0, "{}"),
        ]
        d = _write(spark, tmp_path, "events", rows, EVENT_SCHEMA)
        out = registry.REGISTRY["asof_join_tolerance"].fn(spark, d).collect()
        assert len(out) == 1  # left row always survives
        row = out[0]
        if expect_match:
            assert row.last_view_value == 5.0
            assert row.secs_since_view == float(gap_seconds)
        else:
            assert row.last_view_value is None
            assert row.secs_since_view is None


LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _li_row(order, part):
    from datetime import datetime

    return (order, part, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
            datetime(2024, 1, 1))


class TestConnectedComponentsRepeatPairs:
    def test_two_planted_components(self, spark, tmp_path):
        """Pairs (1,2) and (3,4) each co-occur in 2 orders (kept);
        bridge pair (2,3) co-occurs once (dropped) → components
        {1,2} and {3,4} labeled by their min vertex."""
        rows = []
        for o in (100, 101):
            rows += [_li_row(o, 1), _li_row(o, 2)]
        for o in (200, 201):
            rows += [_li_row(o, 3), _li_row(o, 4)]
        rows += [_li_row(300, 2), _li_row(300, 3)]  # once — below threshold
        d = _write(spark, tmp_path, "lineitem", rows, LINEITEM_SCHEMA)
        out = registry.REGISTRY["connected_components_repeat_pairs"].fn(
            spark, d
        ).collect()
        got = {r.vertex: r.component for r in out}
        assert got == {1: 1, 2: 1, 3: 3, 4: 3}


class TestStreamStaticEnrichment:
    def test_planted_segments(self, spark, tmp_path):
        from datetime import datetime

        ev = [
            (1, datetime(2024, 1, 1, 10), 1, "view", 2.0, "{}"),
            (2, datetime(2024, 1, 1, 11), 1, "view", 3.0, "{}"),
            (3, datetime(2024, 1, 1, 12), 2, "purchase", 7.0, "{}"),
        ]
        d = _write(spark, tmp_path, "events", ev, EVENT_SCHEMA)
        cust = [(1, "c1", 0, 0.0, "SEG_A"), (2, "c2", 0, 0.0, "SEG_B")]
        _write(spark, tmp_path, "customer", cust,
               "c_custkey long, c_name string, c_nationkey int, "
               "c_acctbal double, c_mktsegment string")
        out = registry.REGISTRY["stream_static_enrichment"].fn(spark, d)
        got = {(r.segment, r.event_type): (r.n_events, r.total_value)
               for r in out.collect()}
        assert got == {
            ("SEG_A", "view"): (2, 5.0),
            ("SEG_B", "purchase"): (1, 7.0),
        }
