# -*- coding: utf-8 -*-
"""Event-time streaming operators: the streamed watermarked windowed
aggregation must equal the batch aggregation of the same input once
drained (availableNow), and the stateful sessionizer's closed sessions
must match the batch sessionization."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


def _events_dir(tmpdir):
    """readStream needs a directory; stage the single parquet file."""
    d = os.path.join(tmpdir, "events")
    os.makedirs(d, exist_ok=True)
    os.symlink(
        os.path.join(SF_DIR, "events.parquet"),
        os.path.join(d, "part-0.parquet"),
    )
    return d


def test_windowed_counts_stream_equals_batch(spark):
    from rdf_converter_spark.streaming.windows import (
        stream_windowed_counts, windowed_event_counts,
    )

    out = tempfile.mkdtemp(prefix="wc_")
    try:
        q = stream_windowed_counts(
            spark, _events_dir(out), out,
            window="6 hours", watermark="1 hour",
        )
        q.awaitTermination(300)
        got = {
            tuple(r) for r in
            spark.sql("SELECT * FROM windowed_counts").collect()
        }
        want = {
            tuple(r) for r in
            windowed_event_counts(_events(spark), window="6 hours").collect()
        }
        # availableNow drains every file; append mode emits each window
        # when the watermark passes it — the final watermark is past
        # every window except the ones still open at end-of-stream
        assert got <= want
        assert len(got) >= len(want) * 0.5, (len(got), len(want))
    finally:
        shutil.rmtree(out, ignore_errors=True)


class _FakeTimedOutState:
    """Stands in for GroupState on a timeout invocation."""

    hasTimedOut = True

    def __init__(self, tup):
        self._t = tup
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._t is not None and not self.removed

    @property
    def get(self):
        return self._t

    def remove(self):
        self.removed = True

    def update(self, t):  # pragma: no cover - must not be called
        raise AssertionError("update() on a timed-out key")

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_sessionize_timeout_emits_open_session_and_removes_state():
    """On state.hasTimedOut the handler must emit the open session and
    REMOVE the state entry (not re-arm the timeout) — otherwise idle
    keys' final sessions are never emitted and the state store grows
    unboundedly (ADVICE r2)."""
    import pandas as pd

    from rdf_converter_spark.streaming.windows import _make_session_fn

    fn = _make_session_fn(1800)
    st = _FakeTimedOutState((1_000_000, 2_000_000, 3))
    out = list(fn((42,), iter([]), st))
    assert st.removed
    assert st.timeout_ms is None  # timeout NOT re-armed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert int(row["user_id"]) == 42
    assert int(row["n_events"]) == 3
    assert row["session_start"] == pd.Timestamp(1_000_000, unit="us")
    assert row["session_end"] == pd.Timestamp(2_000_000, unit="us")


def test_sessionize_batch_gap_is_subsecond_accurate(spark):
    """The batch twin compares gaps in microseconds like the streaming
    handler: 1.2 s between events with a 1 s gap must open a new
    session even though the second-truncated difference is exactly 1."""
    from datetime import datetime

    from rdf_converter_spark.streaming.windows import (
        EVENTS_SCHEMA, sessionize,
    )

    rows = [
        (1, datetime(2020, 1, 1, 0, 0, 0, 400000), 7, "c", 0.0, ""),
        (2, datetime(2020, 1, 1, 0, 0, 1, 600000), 7, "c", 0.0, ""),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    assert sessionize(df, gap_seconds=1).count() == 2


def test_sessionize_stateful_matches_batch(spark):
    from rdf_converter_spark.streaming.windows import (
        EVENTS_SCHEMA, sessionize,
    )

    gap = 3600  # 1h gap
    batch = sessionize(_events(spark), gap_seconds=gap)
    bt = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    # the stream emits a session only when a LATER event closes it, so
    # each user's final (open) session stays in state: expected set =
    # batch sessions minus each user's last session
    last = {
        r["user_id"]: r["session_end"]
        for r in batch.groupBy("user_id")
        .agg(F.max("session_end").alias("session_end"))
        .collect()
    }
    want = {t for t in bt if t[2] != last[t[0]]}

    out = tempfile.mkdtemp(prefix="sess_")
    try:
        reader = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "4")
            .parquet(_events_dir(out))
        )
        q = (
            sessionize(reader, gap_seconds=gap)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_stream")
            .option("checkpointLocation", out + "/_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.sql("SELECT * FROM sessions_stream").collect()
        }
        assert got == want, (len(got), len(want))
        assert len(got) > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_dedup_events_stream_equals_batch(spark):
    """Re-delivered (duplicated) event files through the watermarked
    streaming dedup must yield exactly the batch-distinct set: state
    is bounded by the watermark but every within-horizon duplicate is
    suppressed."""
    from rdf_converter_spark.streaming.windows import (
        dedup_events, stream_dedup_events,
    )

    out = tempfile.mkdtemp(prefix="dd_")
    try:
        # the same parquet file staged TWICE = an at-least-once source
        # re-delivering the whole batch
        d = os.path.join(out, "events")
        os.makedirs(d, exist_ok=True)
        src = os.path.join(SF_DIR, "events.parquet")
        os.symlink(src, os.path.join(d, "part-0.parquet"))
        os.symlink(src, os.path.join(d, "part-1.parquet"))

        q = stream_dedup_events(spark, d, out, watermark="30 days")
        q.awaitTermination(300)
        got = {
            r["event_id"] for r in
            spark.sql("SELECT event_id FROM dedup_events").collect()
        }
        batch = _events(spark)
        want = {r["event_id"]
                for r in dedup_events(batch).select("event_id").collect()}
        assert got == want
        n_stream_in = batch.count() * 2
        assert len(got) < n_stream_in  # duplicates actually suppressed
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream interval join, fully drained
    (availableNow with a generous watermark), must produce exactly the
    batch join of the same input — inner join rows are emitted as soon
    as both sides have matched, so no tail is withheld."""
    from rdf_converter_spark.streaming.windows import (
        click_purchase_join, stream_click_purchase_join,
    )

    out = tempfile.mkdtemp(prefix="ssj_")
    try:
        q = stream_click_purchase_join(
            spark, _events_dir(out), out,
            horizon_seconds=3600, watermark="30 days",
        )
        q.awaitTermination(300)
        got = {
            tuple(r) for r in spark.sql(
                "SELECT click_id, user_id, purchase_ts, purchase_value "
                "FROM click_purchase_join"
            ).collect()
        }
        ev = _events(spark)
        want = {
            tuple(r) for r in click_purchase_join(
                ev.filter(F.col("event_type") == "click"),
                ev.filter(F.col("event_type") == "purchase"),
                horizon_seconds=3600,
            ).select(
                "click_id", "user_id", "purchase_ts", "purchase_value"
            ).collect()
        }
        assert got == want
        assert len(want) > 0  # the fixture actually exercises the join
    finally:
        shutil.rmtree(out, ignore_errors=True)
