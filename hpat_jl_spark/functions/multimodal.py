"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed by Arrow-batched `mapInPandas` kernels.

Extension layer (the reference is numeric-only). The container has no
image/audio libraries, so the DECODE step is stubbed two ways:
  - `decode='fake'` (default): a deterministic pure-python decoder that
    treats the payload as raw bytes and emits real, testable features
    (byte length, crc32, byte-histogram entropy, fake width/height from
    a header read). The Spark-side plumbing — schema, Arrow batching,
    partition preservation, UDF signatures — is fully real.
  - `decode='real'`: raises NotImplementedError at the exact call site
    where PIL/libav would be invoked.

Scale design: payloads never pass through a shuffle — all kernels are
mapInPandas (narrow, partition-local); only extracted features (small
fixed-width columns) flow into joins/aggregations downstream. Batch
size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch so a
partition of large blobs doesn't materialize at once.
"""

from __future__ import annotations

import binascii
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fabricate a deterministic binary payload column from text (the
    fixtures carry no real media): payload = utf-8 bytes, metadata
    claims image/png. Lets every downstream kernel run end-to-end."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("png").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _byte_entropy(b: bytes) -> float:
    # np.bincount over the raw buffer: ~50× faster than a per-byte dict
    # loop on large payloads (VERDICT r01), identical values.
    if not b:
        return 0.0
    counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(b)
    return float(-(p * np.log2(p)).sum())


def extract_features(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches;
    one output row per input row; partition-local, no shuffle)."""
    if decode == "real":
        raise NotImplementedError(
            "real image/audio decode requires PIL/libav, not present in "
            "this container; use decode='fake'"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "crc32": payloads.map(
                        lambda b: binascii.crc32(bytes(b)) & 0xFFFFFFFF
                    ).astype("int64"),
                    "entropy": payloads.map(
                        lambda b: round(_byte_entropy(bytes(b)), 6)
                    ),
                    # "header decode": fake 2-byte width/height reads
                    "fake_width": payloads.map(
                        lambda b: int.from_bytes(bytes(b)[:2], "big") if len(b) >= 2 else 0
                    ).astype("int32"),
                    "fake_height": payloads.map(
                        lambda b: int.from_bytes(bytes(b)[2:4], "big") if len(b) >= 4 else 0
                    ).astype("int32"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — plumbing only: passes payloads through mapInPandas
    with the target dims recorded in metadata; the pixel op raises in
    'real' mode (no imaging libs in container)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("target_width", T.IntegerType()),
            T.StructField("target_height", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["payload"],  # identity: real resize is stubbed
                    "target_width": width,
                    "target_height": height,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(kernel, out_schema)


def frame_sample_stub(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling — plumbing: explodes each payload into
    ≤max_frames deterministic byte-slice 'frames' (1 output row per
    frame; real codec decode would replace the slicing)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = min(max_frames, max(1, len(b) // 64))
                for i in range(n):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(b[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.select("doc_id", "payload").mapInPandas(kernel, out_schema)
