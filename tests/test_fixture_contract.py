"""Fixture contract: the driver regenerates the parquet fixtures between
rounds and has already changed the physical timestamp encoding once
(ns-int64 → timestamp[us]/NTZ, which silently broke 4 queries in round 2).

These tests pin the POST-load contract — whatever the driver writes,
``tables.load_table`` must yield EXACTLY the declared schema — and pin
both known physical encodings for the normalization branches, so the next
regeneration fails here, loudly, before the correctness gate sees it.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from hpat_jl_spark import tables
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", tables.TABLE_NAMES)
def test_post_load_schema_matches_declaration(spark, name):
    df = tables.load_table(spark, name, SF_SMOKE)
    declared = tables.SCHEMAS[name]
    actual = {f.name: f.dataType for f in df.schema.fields}
    for field in declared.fields:
        assert field.name in actual, f"{name}.{field.name} missing after load"
        assert actual[field.name] == field.dataType, (
            f"{name}.{field.name}: declared {field.dataType.simpleString()}, "
            f"loaded {actual[field.name].simpleString()}"
        )


def test_unknown_encoding_is_an_error(spark, tmp_path):
    """Reference-style discipline (src/capture-api.jl:628-631): a type the
    declared schema doesn't promise must raise at load, not flow through."""
    bad = spark.createDataFrame(
        [(1, "x")],
        T.StructType(
            [
                T.StructField("r_regionkey", T.StringType()),  # declared Integer
                T.StructField("r_name", T.StringType()),
            ]
        ),
    )
    path = os.path.join(str(tmp_path), "region.parquet")
    bad.write.parquet(path)
    with pytest.raises(TypeError, match="r_regionkey"):
        tables.load_table(spark, "region", str(tmp_path))


@pytest.mark.parametrize("encoding", ["ns_long", "us_ntz", "us_ltz"])
def test_timestamp_encodings_normalize_identically(spark, tmp_path, encoding):
    """All physical encodings the driver has emitted (plus plain LTZ) land
    on the same TimestampType values after load."""
    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    dirpath = str(tmp_path / encoding)
    if encoding == "ns_long":
        df = spark.createDataFrame(
            [(i, m * 1000, i, "view", 1.0, "{}") for i, m in enumerate(micros)],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        )
    else:
        cast_to = "timestamp_ntz" if encoding == "us_ntz" else "timestamp"
        df = spark.createDataFrame(
            [(i, m, i, "view", 1.0, "{}") for i, m in enumerate(micros)],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.expr("timestamp_micros(ts)").cast(cast_to))
    df.write.parquet(os.path.join(dirpath, "events.parquet"))

    out = tables.load_table(spark, "events", dirpath)
    assert out.schema["ts"].dataType == T.TimestampType()
    got = sorted(
        r[0] for r in out.select(F.unix_micros("ts")).collect()
    )
    assert got == micros


@pytest.mark.parametrize("encoding", ["ns_long", "us_ntz"])
def test_stream_source_probes_encoding(spark, tmp_path, encoding):
    """streaming.sources.stream_events must probe the physical ts type —
    declaring the wrong one was round 2's silent 1000x timestamp shrink."""
    from hpat_jl_spark.streaming.sources import stream_events

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    events_dir = str(tmp_path / "events_stream")
    df = spark.createDataFrame(
        [(i, m, i, "view", 1.0, "{}") for i, m in enumerate(micros)],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    if encoding == "ns_long":
        df = df.withColumn("ts", F.col("ts") * F.lit(1000))
    else:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts)").cast("timestamp_ntz"))
    df.write.parquet(events_dir)

    stream = stream_events(spark, events_dir)
    assert stream.schema["ts"].dataType == T.TimestampType()
    sink = f"fixture_probe_{encoding}"
    (
        stream.writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        r[0]
        for r in spark.sql(f"select unix_micros(ts) from {sink}").collect()
    )
    assert got == micros


def test_every_registered_query_has_a_coverage_row():
    """Self-enforcing repo invariant (CLAUDE.md / VERDICT r05 #1): every
    name in the registry must appear in COVERAGE.md, and the header's
    registered-query count must equal the registry size — so a query
    added without its bookkeeping fails loudly instead of rotting."""
    import re

    from hpat_jl_spark import registry

    names = set(registry.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md")) as fh:
        coverage = fh.read()
    missing = sorted(n for n in names if n not in coverage)
    assert not missing, f"registered queries without a COVERAGE.md row: {missing}"
    m = re.search(r"\*\*Round-\d+ status:\*\* (\d+) registered queries", coverage)
    assert m, "COVERAGE.md lost its 'N registered queries' header"
    assert int(m.group(1)) == len(names), (
        f"COVERAGE.md header says {m.group(1)} registered queries, "
        f"registry has {len(names)}"
    )
