"""Multimodal plumbing tests: binary payload column + mapInPandas
kernels produce exact deterministic features; real-decode path raises
the documented NotImplementedError; frame sampling explodes rows
correctly.
"""

from __future__ import annotations

import binascii

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "abcd" * 40), (2, "zz"), (3, "q" * 200)], "doc_id long, text string"
    )
    return M.attach_fake_payload(docs)


def test_payload_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("media_meta.media_type").distinct().collect()
    assert [r[0] for r in meta] == ["image"]


def test_extract_features_exact(media):
    out = {r.doc_id: r for r in M.extract_features(media).collect()}
    assert out[1].n_bytes == 160
    assert out[2].n_bytes == 2
    # crc32 matches python's own over the same bytes
    assert out[2].crc32 == (binascii.crc32(b"zz") & 0xFFFFFFFF)
    # single-repeated-byte payload has zero entropy
    assert out[3].entropy == 0.0
    # fake header decode: first two bytes big-endian
    assert out[2].fake_width == int.from_bytes(b"zz", "big")


def test_real_decode_raises(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        M.extract_features(media, decode="real")


def test_resize_stub_passthrough(media):
    out = M.resize_stub(media, 224, 224)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].target_width == 224
    assert bytes(rows[2].payload) == b"zz"


def test_frame_sample_explodes(media):
    out = M.frame_sample_stub(media)
    counts = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts[1] == 2    # 160 bytes → 2 64-byte frames
    assert counts[2] == 1    # short payload → 1 frame minimum
    assert counts[3] == 3    # 200 bytes → 3 frames
