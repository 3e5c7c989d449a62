# -*- coding: utf-8 -*-
"""WARC (Web ARChive) source — the container format of Common-Crawl
web corpora, parsed library-free.

Two entry points share ONE record kernel:

- ``read_warc(spark, path)`` — distributed file reader:
  ``binaryFile`` scan (one task per WARC file, which is exactly how
  production Common-Crawl jobs parallelize — the files are the
  split unit, ~1 GiB each) + the Arrow-batched record walk.
- ``parse_warc(df, col)`` — parse a string/binary column that holds
  one or more concatenated records (the in-plan round-trip surface
  the driver oracle checks).

The walk is STRUCTURAL, not regex: headers end at the first blank
line, the payload is exactly ``Content-Length`` BYTES (so payloads
containing ``\\r\\n\\r\\nWARC/1.0`` — i.e. bytes that LOOK like a
record boundary — parse correctly; a split-on-separator parser fails
this, and the driver query plants exactly that), then the mandatory
``\\r\\n\\r\\n`` record terminator. Malformed trailing bytes yield a
row with ``warc_type = NULL`` rather than an exception — at crawl
scale truncated records are data, not errors.

Reference behavior: the reference pipeline ingests filesystem
corpora per dataset directory (`run.py`); this source generalizes
that to the web-crawl container per the north rule's
Common-Crawl-style input. Format per ISO 28500 (WARC 1.0/1.1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType([
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

_HDR_MAP = {
    "warc-type": "warc_type",
    "warc-record-id": "record_id",
    "warc-target-uri": "target_uri",
    "warc-date": "warc_date",
    "content-type": "content_type",
}


def iter_warc_records(data: bytes):
    """Walk concatenated WARC records in ``data``; yields one dict
    per record (keys = WARC_SCHEMA field names). Structural: headers
    to the first CRLFCRLF, payload = Content-Length bytes, then the
    record terminator. A malformed tail yields one null-typed record
    carrying the unparsed remainder and stops."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            yield {"warc_type": None, "record_id": None,
                   "target_uri": None, "warc_date": None,
                   "content_type": None, "content_length": None,
                   "payload": bytes(data[pos:])}
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield {"warc_type": None, "record_id": None,
                   "target_uri": None, "warc_date": None,
                   "content_type": None, "content_length": None,
                   "payload": bytes(data[pos:])}
            return
        rec = {"warc_type": None, "record_id": None, "target_uri": None,
               "warc_date": None, "content_type": None,
               "content_length": None, "payload": None}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            key = k.strip().lower().decode("ascii", "replace")
            val = v.strip().decode("utf-8", "replace")
            if key == "content-length":
                try:
                    rec["content_length"] = int(val)
                except ValueError:
                    pass
            elif key in _HDR_MAP:
                rec[_HDR_MAP[key]] = val
        clen = rec["content_length"]
        body_start = hdr_end + 4
        if clen is None or body_start + clen > n:
            rec["warc_type"] = None  # length missing/overruns: malformed
            rec["payload"] = bytes(data[pos:])
            yield rec
            return
        rec["payload"] = bytes(data[body_start:body_start + clen])
        yield rec
        pos = body_start + clen


def _parse_batches(
    frames: Iterator[pd.DataFrame], col: str
) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in WARC_SCHEMA.fields]
    for pdf in frames:
        out = []
        for raw in pdf[col]:
            if raw is None:
                continue
            data = raw.encode("utf-8") if isinstance(raw, str) else bytes(raw)
            out.extend(iter_warc_records(data))
        yield pd.DataFrame(out, columns=cols)


def parse_warc(df: DataFrame, col: str = "content") -> DataFrame:
    """Explode a string/binary column of concatenated WARC records
    into one row per record (WARC_SCHEMA). Arrow-batched; 1:N
    fan-out, no shuffle."""
    return df.select(col).mapInPandas(
        lambda it: _parse_batches(it, col), WARC_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC file reader: one task per file (binaryFile
    scan — the Common-Crawl parallel unit), records exploded by the
    shared kernel. Returns WARC_SCHEMA plus the source ``path``."""
    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc").load(path)

    schema = T.StructType(
        [T.StructField("path", T.StringType())] + list(WARC_SCHEMA.fields)
    )

    def run(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path"] + [f.name for f in WARC_SCHEMA.fields]
        for pdf in frames:
            out = []
            for p, raw in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(raw)):
                    rec = dict(rec)
                    rec["path"] = p
                    out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(run, schema)


def warc_record_expr(
    uri, date, payload, record_id, warc_type: str = "response",
    content_type: str = "text/html",
):
    """Column expression building one spec-conformant WARC record
    around a payload column — Content-Length in BYTES (octet_length),
    CRLF line endings, CRLFCRLF terminator. The writer twin of the
    parser, used by tests and the driver round-trip query."""
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: %s\r\n" % warc_type),
        F.lit("WARC-Record-ID: "), record_id, F.lit("\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Date: "), date, F.lit("\r\n"),
        F.lit("Content-Type: %s\r\n" % content_type),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"), F.lit("\r\n\r\n"),
        payload, F.lit("\r\n\r\n"),
    )
