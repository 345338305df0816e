"""Mid-stream kill-and-resume (VERDICT r07 #5).

stream_foreach_batch_upsert proves foreachBatch replay idempotence and
checkpointed_pagerank proves BATCH restart — but nothing killed a
running STREAMING query mid-replay and resumed it from its checkpoint.
These tests do exactly that for the two heavy stateful queries, on the
streaming probe's multi-batch time-sliced replay shape:

1. events (sf0.001) is staged as 12 event-time-ordered slices;
2. the first 6 slices are fed to a LIVE query (processingTime trigger,
   maxFilesPerTrigger=1, parquet file sink — the memory sink cannot
   resume a checkpoint, CLAUDE.md); the query is stop()ped as soon as
   the slice-5 rows are observed in progress, i.e. while batch 6 may
   still be in flight — a genuine mid-replay kill;
3. the remaining 6 slices land in the source dir and a NEW SparkSession
   resumes the query from the same checkpoint with availableNow;
4. the final sink contents must equal (as sorted rows) an uninterrupted
   12-slice run — the file sink's _spark_metadata commit log plus
   checkpointed source offsets give exactly-once across the kill.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.streaming.dedup import dedup_within_watermark
from hpat_jl_spark.streaming.replay import stage_time_slices
from hpat_jl_spark.streaming.windows import stream_stream_purchase_after_view

SF = "/root/testdata/sf0.001"
N_SLICES = 12
SPLIT = 6


def _reader(spark, src_dir: str):
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def _start(spark, make_stream, src_dir, sink, ckpt, trigger):
    out = make_stream(_reader(spark, src_dir))
    writer = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
    )
    if trigger == "live":
        writer = writer.trigger(processingTime="50 milliseconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _sink_rows(spark, sink: str) -> list[tuple]:
    if not os.path.isdir(sink):
        return []
    df = spark.read.parquet(sink)  # honors the _spark_metadata commit log
    rows = [
        tuple(
            round(v, 6) if isinstance(v, float) else v
            for v in r
        )
        for r in df.collect()
    ]
    return sorted(rows, key=repr)


def _processed_rows(q) -> int:
    return sum(p["numInputRows"] for p in q.recentProgress)


@pytest.mark.parametrize(
    "name,make_stream",
    [
        (
            "stream_stream_join_purchases",
            lambda ev: stream_stream_purchase_after_view(ev, watermark="1 hour"),
        ),
        (
            "stream_dedup_events",
            lambda ev: dedup_within_watermark(
                ev, keys=["event_id"], delay="1 hour"
            ),
        ),
    ],
)
def test_kill_and_resume_matches_uninterrupted(spark, tmp_path, name, make_stream):
    slices_dir = tmp_path / "slices"
    slices = stage_time_slices(spark, SF, str(slices_dir), N_SLICES)
    assert len(slices) == N_SLICES
    slice_rows = [
        spark.read.parquet(p).count() for p in slices
    ]

    # --- reference: uninterrupted 12-slice replay -------------------
    ref_src = tmp_path / "src_ref"
    ref_src.mkdir()
    for i, p in enumerate(slices):
        dst = ref_src / os.path.basename(p)
        shutil.copy(p, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    q = _start(
        spark, make_stream, str(ref_src), str(tmp_path / "sink_ref"),
        str(tmp_path / "ckpt_ref"), "available",
    )
    assert q.awaitTermination(300)
    expected = _sink_rows(spark, str(tmp_path / "sink_ref"))
    assert expected, f"{name}: uninterrupted run produced no rows"

    # --- interrupted run: 6 slices, live trigger, kill --------------
    src = tmp_path / "src"
    src.mkdir()
    for i, p in enumerate(slices[:SPLIT]):
        dst = src / os.path.basename(p)
        shutil.copy(p, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = _start(spark, make_stream, str(src), sink, ckpt, "live")
    # Kill as soon as slice 5's rows are visible in progress — batch 6
    # may still be mid-flight, which is the point: its replay on resume
    # must not double-emit (file-sink commit log).
    want = sum(slice_rows[: SPLIT - 1])
    deadline = time.time() + 240
    while _processed_rows(q) < want:
        assert q.isActive, f"{name}: query died early: {q.exception()}"
        assert time.time() < deadline, (
            f"{name}: only {_processed_rows(q)}/{want} rows before timeout"
        )
        time.sleep(0.05)
    q.stop()
    q.awaitTermination(60)

    # --- resume from the checkpoint in a NEW session ----------------
    for i, p in enumerate(slices[SPLIT:], start=SPLIT):
        dst = src / os.path.basename(p)
        shutil.copy(p, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    spark2 = spark.newSession()
    q2 = _start(spark2, make_stream, str(src), sink, ckpt, "available")
    assert q2.awaitTermination(300)

    got = _sink_rows(spark, sink)
    assert got == expected, (
        f"{name}: resumed output diverges from uninterrupted run "
        f"({len(got)} vs {len(expected)} rows)"
    )
