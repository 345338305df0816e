"""Multi-batch stream replay staging — shared by the state-boundedness
probe (scripts/streaming_probe.py) and the kill-and-resume tests.

A single availableNow pass over one fixture file runs as ONE
micro-batch: the watermark never advances mid-run, so neither state
eviction nor checkpoint resume is actually exercised (CLAUDE.md r7
trap). This helper stages `events` as N event-time-ordered single-file
slices with ascending mtimes, so a file-source reader with
maxFilesPerTrigger=1 replays them as N micro-batches in event-time
order — the watermark advances between batches exactly as it would
against a live source.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession


def stage_time_slices(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    n_slices: int = 12,
) -> list[str]:
    """Write the `events` table of ``src_dir`` ordered by (ts,
    event_id) into ``n_slices`` equal-row single parquet files under
    ``out_dir`` named events_000.parquet.. with ascending mtimes (the
    file source enumerates new files in mod-time order). Returns the
    ordered file paths. ``out_dir`` is created; existing slice files
    are overwritten."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hpat_jl_spark.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    ev = load_table(spark, "events", src_dir)
    n = ev.count()
    per = max(1, n // n_slices)
    ranked = ev.select(
        "*",
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("_rn"),
    )
    paths: list[str] = []
    t0 = time.time()
    for i in range(n_slices):
        lo = i * per + 1
        hi = (i + 1) * per if i < n_slices - 1 else n
        tmp = os.path.join(out_dir, f"_slice_{i:03d}")
        (
            ranked.filter((F.col("_rn") >= lo) & (F.col("_rn") <= hi))
            .drop("_rn")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"events_{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))
        shutil.rmtree(tmp)
        paths.append(dst)
    return paths
