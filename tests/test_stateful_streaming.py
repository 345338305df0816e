"""applyInPandasWithState: state must accumulate across micro-batches
AND across query restarts (checkpoint recovery) — verified by replaying
the events fixture in two file drops with a shared checkpoint."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.streaming.sources import stream_events
from hpat_jl_spark.streaming.stateful import running_user_totals
from hpat_jl_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _run_batch(spark, events_dir, ckpt):
    # memory sink can't recover from a checkpoint; foreachBatch can
    collected: list[pd.DataFrame] = []
    q = (
        running_user_totals(stream_events(spark, events_dir))
        .writeStream.foreachBatch(
            lambda df, _id: collected.append(df.toPandas())
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = pd.concat(collected, ignore_index=True) if collected else pd.DataFrame()
    # keep the LAST emitted row per user from this run
    return out.groupby("user_id").last().reset_index()


def test_state_survives_restart(spark, tmp_path):
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # batch 1: first copy of the fixture
    shutil.copy(f"{SF}/events.parquet", events_dir / "a.parquet")
    got1 = _run_batch(spark, str(events_dir), ckpt)
    batch = (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .toPandas()
    )
    m1 = got1.set_index("user_id").sort_index()
    b = batch.set_index("user_id").sort_index()
    assert (m1["n_events"] == b["n"]).all()
    assert m1["total_value"].round(2).equals(b["t"].round(2))

    # batch 2: drop the SAME file again under a new name → totals double
    # (state recovered from checkpoint by a NEW query instance)
    shutil.copy(f"{SF}/events.parquet", events_dir / "b.parquet")
    got2 = _run_batch(spark, str(events_dir), ckpt)
    m2 = got2.set_index("user_id").sort_index()
    assert (m2["n_events"] == 2 * b["n"]).all()
    pd.testing.assert_series_equal(
        m2["total_value"].round(1), (2 * b["t"]).round(1),
        check_names=False,
    )
