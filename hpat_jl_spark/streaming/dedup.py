"""Streaming deduplication with bounded state.

`dropDuplicates` on a stream keeps every key seen FOREVER — on a 100 TB
/ weeks-long stream that state grows without bound and the job dies.
`dropDuplicatesWithinWatermark` (Spark 3.5+) keeps a key's state only
until the event-time watermark passes its first-seen timestamp + the
watermark delay, so state is bounded by (arrival rate × delay). The
trade-off is explicit and documented here: a duplicate arriving AFTER
its key's state was evicted is re-emitted. Pick the delay to cover the
real duplicate-arrival gap (e.g. the Kafka producer retry horizon).

Semantics pinned in tests/test_streaming.py:
- duplicates within the delay collapse (doubled source == batch distinct)
- a duplicate re-arriving after eviction is re-emitted (bounded-state
  contract, not a bug)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    delay: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Bounded-state streaming exact dedup on ``keys``.

    Unlike plain ``dropDuplicates(keys)``, duplicates may carry
    DIFFERENT event timestamps (retries, replays) — the match is on
    ``keys`` alone, and the state for a key lives for ``delay`` of
    event time past its first occurrence."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
