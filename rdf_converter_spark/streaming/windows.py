# -*- coding: utf-8 -*-
"""Event-time streaming operators: watermarked windowed aggregation and
a custom stateful sessionizer (``applyInPandasWithState``).

These are the late-data / stateful building blocks the web-scale
crawl pipeline needs around the extraction core: windowed crawl-rate
rollups that tolerate out-of-order WARC timestamps, and gap-based
sessionization of per-key event streams (the canonical custom
stateful operator the built-in windows can't express).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark: late
    rows inside the watermark still update their window; beyond it the
    state is dropped (bounded state at 10^12 events). Works on both a
    streaming and a batch frame — batch simply ignores the watermark,
    which is what makes the equivalence test possible."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "total",
        )
    )


def stream_windowed_counts(
    spark: SparkSession, events_path: str, out_dir: str,
    window: str = "1 hour", watermark: str = "2 hours",
):
    """File-stream the events table through the windowed aggregation
    into an in-memory sink (append mode: a window is emitted once its
    watermark passes; availableNow drains everything)."""
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(events_path)
    )
    agg = windowed_event_counts(reader, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("windowed_counts")
        .option("checkpointLocation", out_dir + "/_wc_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Gap-based sessionization per user via applyInPandasWithState —
    the custom stateful operator shape (running state per key, emit on
    gap). Each emitted row is one closed session; the open session per
    key stays in the state store. On a batch frame (tests/oracles) the
    same semantics are computed with a lag/cumsum window instead."""
    if not events.isStreaming:
        from pyspark.sql import Window as W

        wl = W.partitionBy("user_id").orderBy("ts", "event_id")
        # parquet may surface ts as TIMESTAMP_NTZ (no direct long cast).
        # Gap compared in MICROSECONDS, matching the streaming fn
        # (t.value // 1000 below) — second-truncated longs would
        # sessionize sub-second boundary gaps differently between the
        # batch twin and the stream (ADVICE r2).
        as_us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
        gap = as_us("ts") - as_us("_prev")
        marked = (
            events.withColumn("_prev", F.lag("ts").over(wl))
            .withColumn(
                "_new",
                F.when(F.col("_prev").isNull() |
                       (gap > gap_seconds * 10**6), 1).otherwise(0),
            )
        )
        sess_id = F.sum("_new").over(
            wl.rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            marked.withColumn("_sess", sess_id)
            .groupBy("user_id", "_sess")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("n_events"),
            )
            .drop("_sess")
            .select("user_id", "session_start", "session_end", "n_events")
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _make_session_fn(gap_seconds: int):
    """The per-key state handler, module-level so the timeout branch is
    unit-testable against a fake GroupState."""

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # the key went idle past the gap: close and emit the open
            # session and DROP the state entry — re-arming the timeout
            # here would keep every idle key's state forever and the
            # final session would never be emitted (ADVICE r2)
            if state.exists:
                start_ms, last_ms, n = state.get
                state.remove()
                if start_ms is not None:
                    yield pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "session_start": pd.to_datetime(
                                [start_ms], unit="us"
                            ),
                            "session_end": pd.to_datetime(
                                [last_ms], unit="us"
                            ),
                            "n_events": [n],
                        }
                    )
            return
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms = last_ms = None
            n = 0
        out = []
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t.value // 1000) for t in pdf["ts"])
        for t in sorted(ts_all):
            if last_ms is not None and t - last_ms > gap_seconds * 10**6:
                out.append((user_id, start_ms, last_ms, n))
                start_ms, n = t, 0
            if start_ms is None:
                start_ms = t
            last_ms = t
            n += 1
        state.update((start_ms, last_ms, n))
        # (re-)arm the idle timeout ONLY on a data invocation — new
        # events arrived, so the key is live again
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime(
                        [o[1] for o in out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "n_events": [o[3] for o in out],
                }
            )

    return fn


def dedup_events(
    events: DataFrame,
    keys: Tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once event dedup: re-delivered rows (at-least-
    once sources re-emit under retries) are dropped on their key.

    Streaming uses ``dropDuplicatesWithinWatermark`` — the state store
    keeps one entry per key only until the event-time watermark passes
    it, so state is BOUNDED by the watermark horizon instead of
    growing with the whole stream (the difference between a pipeline
    that survives 10^12 events and one that OOMs its state store);
    duplicates arriving within the horizon are suppressed, which is
    the delivery-retry window by construction. A batch frame gets the
    plain ``dropDuplicates`` twin — over fully-duplicated rows both
    produce the identical set, which is what the stream==batch test
    pins."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark) \
            .dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))


def stream_dedup_events(
    spark: SparkSession, events_path: str, out_dir: str,
    keys: Tuple[str, ...] = ("event_id",), watermark: str = "2 hours",
):
    """File-stream events through the watermarked dedup into a memory
    sink (append; availableNow drains everything)."""
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_path)
    )
    ded = dedup_events(reader, keys=keys, watermark=watermark)
    return (
        ded.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_events")
        .option("checkpointLocation", out_dir + "/_dd_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time stream-stream inner join: each click pairs with the
    same user's purchases inside the trailing ``horizon_seconds``
    window (purchase at-or-before the click, click - horizon <
    purchase). On streaming inputs BOTH sides carry a watermark and
    the join condition bounds event time in both directions, which is
    exactly what lets Spark expire join state — without the range
    bound each side's state grows with the whole stream and a
    10^12-event join OOMs. Batch inputs run the same join verbatim
    (the watermark is a no-op there), giving the stream==batch twin
    the tests and the DuckDB oracle pin down.
    """
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (c["user_id"] == p["p_user"])
        & (p["purchase_ts"] <= c["click_ts"])
        & (p["purchase_ts"]
           > c["click_ts"] - F.expr("INTERVAL %d SECONDS" % horizon_seconds))
    )
    return c.join(p, cond, "inner").drop("p_user")


def stream_click_purchase_join(
    spark: SparkSession, events_path: str, out_dir: str,
    horizon_seconds: int = 3600, watermark: str = "2 hours",
):
    """File-stream the events table through the stream-stream join
    into a memory sink (append; availableNow drains everything). Both
    sides read the SAME file stream and filter by event_type — the
    standard fan-out of one source into a self-join."""
    def reader():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "8")
            .parquet(events_path)
        )

    clicks = reader().filter(F.col("event_type") == "click")
    purchases = reader().filter(F.col("event_type") == "purchase")
    joined = click_purchase_join(
        clicks, purchases,
        horizon_seconds=horizon_seconds, watermark=watermark,
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("click_purchase_join")
        .option("checkpointLocation", out_dir + "/_ssj_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
