"""Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``.

``stateful.streaming_first_occurrence`` suppresses a fingerprint for the
whole stream lifetime — state grows with distinct fingerprints forever.
This module is the production-sane bounded twin: duplicates are
suppressed only while they can still arrive within the watermark delay,
and the state store EVICTS a fingerprint once the watermark passes its
event time + delay.  At 10^12 docs/day the state held at any instant is
bounded by (arrival rate x delay), not by corpus history — the right
default when near-in-time duplicates (retries, crawler refetches,
at-least-once upstream delivery) dominate and an occasional far-apart
re-emission is acceptable (a downstream batch exact-dedup catches it).

Contrast documented here so callers pick deliberately:

===========================  ==========================  ================
                             first_occurrence            within_watermark
===========================  ==========================  ================
state size                   O(all fingerprints ever)    O(rate x delay)
far-apart duplicate          suppressed                  re-emitted
late row (< watermark)       still deduped               dropped entirely
===========================  ==========================  ================
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    *,
    fingerprint_col: str = "fingerprint",
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Keep one row per fingerprint among rows arriving within ``delay``.

    Exactly Spark's ``dropDuplicatesWithinWatermark``: which of the
    duplicate rows survives is arrival-order dependent (assert on keys,
    not on the surviving row's payload).  Rows older than the current
    watermark are dropped before the operator sees them.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )
