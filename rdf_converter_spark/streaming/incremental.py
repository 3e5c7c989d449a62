# -*- coding: utf-8 -*-
"""Incremental triple extraction with Structured Streaming.

The reference is strictly batch (full rematerialization per run); the
web-scale generalization processes newly crawled pages as they land.
``readStream`` over the web_pages location + ``foreachBatch`` reusing
the exact batch volume-path (route -> parse -> emit -> dedup within
batch) keeps one code path for both modes; the output table is
append-only and the global set semantics are restored by the periodic
batch dedup/canonicalization (or an Iceberg MERGE in a catalog
deployment). Checkpointing makes the stream exactly-once at the sink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..pipelines.runner import build_triples_extraction
from ..sources.route import route
from ..sources.web_pages import WEB_PAGES_SCHEMA


def stream_triples(
    spark: SparkSession,
    web_pages_path: str,
    out_dir: str,
    trigger_once: bool = True,
    max_files_per_trigger: int = 64,
):
    """Start the incremental extraction stream; returns the query."""
    reader = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(web_pages_path)
    )
    sink_path = os.path.join(out_dir, "triples_stream")
    ckpt_path = os.path.join(out_dir, "_stream_checkpoint")

    def process_batch(batch_df, batch_id: int):
        triples = build_triples_extraction(batch_df.sparkSession,
                                           route(batch_df))
        (
            triples.write.mode("append").parquet(sink_path)
        )

    writer = reader.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
