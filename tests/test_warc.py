# -*- coding: utf-8 -*-
"""WARC source (sources/warc.py): structural Content-Length walk,
fake-boundary payloads, malformed tails, the binaryFile-based
distributed file reader, and the writer/parser round trip."""

import os

import pytest

from rdf_converter_spark.sources.warc import (
    iter_warc_records, parse_warc, read_warc, warc_record_expr,
)


def _record(uri, payload: bytes, rid="<urn:x:1>", wtype="response"):
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype.encode() + b"\r\n"
        b"WARC-Record-ID: " + rid.encode() + b"\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def test_kernel_walks_multiple_records():
    data = _record("http://a/", b"hello") + _record(
        "http://b/", b"world!!", rid="<urn:x:2>", wtype="metadata"
    )
    recs = list(iter_warc_records(data))
    assert [(r["target_uri"], r["payload"], r["warc_type"],
             r["content_length"]) for r in recs] == [
        ("http://a/", b"hello", "response", 5),
        ("http://b/", b"world!!", "metadata", 7),
    ]


def test_kernel_payload_with_fake_boundary():
    evil = b"inner\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n tail"
    data = _record("http://a/", evil) + _record("http://b/", b"next")
    recs = list(iter_warc_records(data))
    # a split-on-separator parser would see 3+ records / wrong bodies
    assert len(recs) == 2
    assert recs[0]["payload"] == evil
    assert recs[1]["target_uri"] == "http://b/"


def test_kernel_malformed_tail_is_data_not_exception():
    good = _record("http://a/", b"ok")
    recs = list(iter_warc_records(good + b"GARBAGE-NOT-A-RECORD"))
    assert recs[0]["target_uri"] == "http://a/"
    assert recs[1]["warc_type"] is None
    assert recs[1]["payload"] == b"GARBAGE-NOT-A-RECORD"
    # overrunning Content-Length (truncated file) also degrades
    trunc = _record("http://c/", b"full-payload")[:-10]
    recs2 = list(iter_warc_records(trunc))
    assert recs2[0]["warc_type"] is None


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    for i in range(3):
        payload = ("page-%d" % i).encode()
        (d / ("f%d.warc" % i)).write_bytes(
            _record("http://host/%d" % i, payload,
                    rid="<urn:f:%d>" % i)
            + _record("http://host/%d-b" % i, b"second",
                      rid="<urn:f:%d-b>" % i)
        )
    (d / "ignored.txt").write_text("not a warc")
    out = read_warc(spark, str(d)).collect()
    assert len(out) == 6
    uris = sorted(r.target_uri for r in out)
    assert uris[0] == "http://host/0" and len(set(uris)) == 6
    by_id = {r.record_id: r for r in out}
    assert bytes(by_id["<urn:f:1>"].payload) == b"page-1"
    assert by_id["<urn:f:2-b>"].content_length == 6
    assert all(r.path for r in out)


def test_writer_parser_round_trip_in_plan(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "text with\r\n\r\nWARC/1.0 fake boundary"), (2, "plain")],
        ["i", "body"],
    )
    blob = warc_record_expr(
        F.concat(F.lit("http://t/"), F.col("i").cast("string")),
        F.lit("2024-01-01T00:00:00Z"),
        F.col("body"),
        F.concat(F.lit("<urn:t:"), F.col("i").cast("string"), F.lit(">")),
    )
    recs = parse_warc(df.select(blob.alias("content")), "content")
    got = {r.record_id: bytes(r.payload).decode() for r in recs.collect()}
    assert got == {
        "<urn:t:1>": "text with\r\n\r\nWARC/1.0 fake boundary",
        "<urn:t:2>": "plain",
    }
