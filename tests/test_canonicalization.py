# -*- coding: utf-8 -*-
"""Connected-components + salted dedup operators."""

import random

from pyspark.sql import functions as F


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in parent}


def _check(spark, edges):
    from rdf_converter_spark.operators.cc import connected_components

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _union_find_oracle(edges)
    # canonical representative = min of component in both cases
    assert got == want, (sorted(got.items())[:10], sorted(want.items())[:10])


def test_cc_chain(spark):
    _check(spark, [("v%02d" % i, "v%02d" % (i + 1)) for i in range(12)])


def test_cc_star_and_islands(spark):
    edges = [("hub", "s%02d" % i) for i in range(20)]
    edges += [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    _check(spark, edges)


def test_cc_random(spark):
    rng = random.Random(7)
    verts = ["n%03d" % i for i in range(120)]
    edges = [
        (rng.choice(verts), rng.choice(verts)) for _ in range(150)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_alias_edges_and_canonicalize(spark):
    from rdf_converter_spark.operators.cc import (
        alias_edges_from_lineage,
        canonicalize_triples,
        connected_components,
    )

    lineage = spark.createDataFrame(
        [
            ("R123.mp4", "uri:a"),
            ("123", "uri:b"),
            ("MEDIA_7.xml", "uri:c"),
            ("PROG_7", "uri:d"),
            ("999", "uri:e"),
        ],
        "identifier string, uri string",
    )
    edges = alias_edges_from_lineage(lineage)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {("uri:a", "uri:b"), ("uri:c", "uri:d")}

    comps = connected_components(edges)
    triples = spark.createDataFrame(
        [
            ("uri:b", "p", "uri:d", True, None, None),
            ("uri:e", "p", "lit-uri:b", False, None, None),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean,"
        "obj_lang string, obj_datatype string",
    )
    out = canonicalize_triples(triples, comps).collect()
    rows = {(r["subj"], r["obj"]) for r in out}
    # subj uri:b -> uri:a; obj uri:d -> uri:c; literals untouched
    assert rows == {("uri:a", "uri:c"), ("uri:e", "lit-uri:b")}


def test_salted_dedup_equals_plain_distinct(spark):
    from rdf_converter_spark.operators.salt import salted_dedup

    rows = [("k%d" % (i % 5), i % 3) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = {(r["k"], r["v"]) for r in salted_dedup(df).collect()}
    want = {(r["k"], r["v"]) for r in df.distinct().collect()}
    assert got == want


def test_salted_dedup_skewed_hub(spark):
    """A hub key occupying 50% of rows must still dedup exactly."""
    from rdf_converter_spark.operators.salt import salted_dedup

    rows = [("hub", 1)] * 500 + [("k%d" % i, i) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v int").repartition(16)
    out = salted_dedup(df)
    assert out.count() == 501
