"""Streaming layer tests: replay the events fixture as a file-source
stream (availableNow trigger → memory sink) and check the results
against the BATCH equivalents on the same data — the strongest
equivalence the layer claims (streaming q02 sessionization must agree
with the batch lag-based plan on session count and totals).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hpat_jl_spark.streaming.sources import stream_events
from hpat_jl_spark.streaming.windows import sessionize_stream, tumbling_counts
from hpat_jl_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    got = _run_stream(spark, tumbling_counts(stream), "tumbling").toPandas()
    batch = (
        load_table(spark, "events", SF)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    assert len(got) == len(batch)
    assert int(got["n_events"].sum()) == 1000  # every event in one window


def test_stream_static_join(spark, events_dir):
    from hpat_jl_spark.streaming.windows import enrich_with_dim

    dim = spark.createDataFrame(
        [(u, f"user-{u}") for u in range(20)], "user_id long, user_name string"
    )
    stream = stream_events(spark, events_dir)
    enriched = enrich_with_dim(stream, dim, "user_id").groupBy("user_name").count()
    got = _run_stream(spark, enriched, "enriched").toPandas()
    assert int(got["count"].sum()) == 1000
    assert got["user_name"].notna().all()


def test_stream_stream_join_matches_batch(spark, events_dir):
    from hpat_jl_spark.streaming.windows import stream_stream_purchase_after_view

    stream = stream_events(spark, events_dir)
    j = stream_stream_purchase_after_view(stream)
    q = (
        j.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ss_join").toPandas()
    # batch twin on the same data
    ev = load_table(spark, "events", SF)
    views = ev.filter("event_type = 'view'").selectExpr(
        "user_id v_user", "ts v_ts", "value v_value"
    )
    purchases = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id p_user", "ts p_ts", "event_id p_event_id"
    )
    batch = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 3600 SECONDS")),
    ).count()
    assert len(got) == batch
    assert len(got) > 0


def test_streaming_dedup_drop_duplicates(spark, events_dir):
    """Streaming exact dedup: dropDuplicates within the watermark —
    the streaming twin of the batch dedup pass (duplicate event_ids
    from a doubled source collapse to one)."""
    d2 = events_dir + "_dup"
    import os
    import shutil as sh

    os.makedirs(d2, exist_ok=True)
    sh.copy(f"{SF}/events.parquet", f"{d2}/a.parquet")
    sh.copy(f"{SF}/events.parquet", f"{d2}/b.parquet")  # exact duplicates
    stream = stream_events(spark, d2)
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])
    agg = deduped.groupBy().count()
    got = _run_stream(spark, agg, "dedup_stream").toPandas()
    assert int(got["count"].iloc[0]) == 1000  # 2000 rows → 1000 unique


def test_sessionize_stream_matches_batch_sessions(spark, events_dir):
    from hpat_jl_spark.plans.windowed import sessionize_events

    stream = stream_events(spark, events_dir)
    got = _run_stream(
        spark, sessionize_stream(stream, gap="1 hour"), "sessions"
    ).toPandas()
    batch = sessionize_events(spark, SF).toPandas()
    # same number of sessions overall and per user
    assert len(got) == len(batch)
    g = got.groupby("user_id").size().to_dict()
    b = batch.groupby("user_id").size().to_dict()
    assert g == b
    # same total events across sessions
    assert int(got["n_events"].sum()) == 1000
    # per-session values agree (compare sorted totals per user)
    for uid in g:
        gv = sorted(got[got.user_id == uid]["session_value"])
        bv = sorted(batch[batch.user_id == uid]["session_value"])
        assert gv == pytest.approx(bv)
