# -*- coding: utf-8 -*-
"""URL canonicalization vectors + URL-level dedup."""

from pyspark.sql import functions as F

VECTORS = [
    # (raw, canonical)
    ("https://example.com/page/1", "https://example.com/page/1"),
    ("HTTPS://EXAMPLE.COM/page/1#frag", "https://example.com/page/1"),
    ("https://example.com:443/page/1/", "https://example.com/page/1"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # kept
    ("https://e.com/p?utm_source=x&utm_medium=y",
     "https://e.com/p"),
    ("https://e.com/p?a=1&utm_source=x&b=2",
     "https://e.com/p?a=1&b=2"),
    ("https://e.com/p?utm_source=x&a=1", "https://e.com/p?a=1"),
    ("https://e.com/p?ref=tw#top", "https://e.com/p"),
    ("https://e.com/p?a=1", "https://e.com/p?a=1"),  # real param kept
    ("no-scheme/path/", "no-scheme/path"),
]


def test_canonical_url_vectors(spark):
    from rdf_converter_spark.operators.urlkit import canonical_url

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(VECTORS)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (raw, want) in enumerate(VECTORS):
        assert got[i] == want, (raw, got[i], want)


def test_url_dedup_groups_variants(spark):
    from rdf_converter_spark.operators.urlkit import url_dedup

    rows = [
        (1, "https://site.com/x"),
        (2, "HTTPS://SITE.COM/x#f"),
        (3, "https://site.com:443/x/"),
        (4, "https://site.com/x?utm_source=a"),
        (5, "https://other.com/y"),
    ]
    out = {
        r["canonical_url"]: (r["survivor_id"], r["n_variants"])
        for r in url_dedup(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert out["https://site.com/x"] == (1, 4)
    assert out["https://other.com/y"] == (5, 1)
