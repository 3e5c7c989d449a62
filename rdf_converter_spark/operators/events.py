# -*- coding: utf-8 -*-
"""Event-stream derivations over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

Complements the streaming twins in ``streaming/windows.py`` with the
batch window-function surface a clickstream/telemetry pipeline needs.
Everything is a single hash exchange on the partition key plus an
in-partition sort — the same cost envelope as the as-of join
(operators/asof.py), and the shape that scales: per-key state during
the window scan is O(1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_deltas(events: DataFrame) -> DataFrame:
    """Per-user consecutive deltas: value change and inter-event gap
    (seconds) vs the previous event of the same user, ordered by
    (ts, event_id) — the id tiebreak makes equal-timestamp rows
    deterministic in every engine. First event per user has NULL
    deltas."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - prev_v, 6).alias("value_delta"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
        ).alias("gap_seconds"),
    )
