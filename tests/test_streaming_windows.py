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
