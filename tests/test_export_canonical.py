# -*- coding: utf-8 -*-
"""Turtle export + canonicalization integration."""

import os


def test_to_turtle_deterministic(spark, tmp_path):
    from rdf_converter_spark.operators.export import to_turtle

    df = spark.createDataFrame(
        [
            ("u:a", "p:x", "u:b", True, None, None),
            ("u:a", "p:y", 'va"l\n2', False, "fr", None),
            ("u:a", "p:z", "2019-05-14", False, None,
             "http://www.w3.org/2001/XMLSchema#date"),
        ],
        "subj string, pred string, obj string, obj_is_uri boolean,"
        "obj_lang string, obj_datatype string",
    )
    p1 = str(tmp_path / "g1.nt")
    p2 = str(tmp_path / "g2.nt")
    assert to_turtle(df, p1) == 3
    assert to_turtle(df.orderBy("pred"), p2) == 3
    t1 = open(p1).read()
    assert t1 == open(p2).read()  # deterministic regardless of order
    assert '<u:a> <p:x> <u:b> .' in t1
    assert '"va\\"l\\n2"@fr' in t1
    assert '^^<http://www.w3.org/2001/XMLSchema#date>' in t1


def test_to_turtle_distributed(spark, tmp_path):
    from rdf_converter_spark.operators.export import to_turtle_distributed

    df = spark.createDataFrame(
        [("u:%d" % i, "p", "o%d" % i, False, None, None) for i in range(50)],
        "subj string, pred string, obj string, obj_is_uri boolean,"
        "obj_lang string, obj_datatype string",
    )
    out = str(tmp_path / "nt_dir")
    to_turtle_distributed(df, out)
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += open(os.path.join(out, f)).read().splitlines()
    assert len(lines) == 50
    assert all(line.endswith(" .") for line in lines)


def test_canonicalize_over_pipeline_lineage(spark, corpus, tmp_path):
    """End-to-end alias canonicalization on real pipeline outputs:
    with synthetic alias rows injected into the lineage, the triple
    table's URIs collapse to component minima; without aliases the
    table is unchanged."""
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators.cc import (
        alias_edges_from_lineage,
        canonicalize_triples,
        connected_components,
    )
    from rdf_converter_spark.pipelines import ld as ldp
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    routed = route(read_web_pages(spark, os.path.join(corpus, "web_pages")))
    programs = ldp.parse_ld_programs(routed)
    lineage = ldp.ld_lineage(programs).select("identifier", "uri")
    triples = ldp.ld_program_triples(programs)

    # no aliases in the natural LD lineage -> identity rewrite
    comps = connected_components(alias_edges_from_lineage(lineage))
    before = triples.count()
    ident = canonicalize_triples(triples, comps)
    assert ident.count() == before

    # inject one alias: a row claiming 'R<id>' maps to a second URI
    some = lineage.limit(1).collect()[0]
    alias = spark.createDataFrame(
        [("R" + some["identifier"], "uri:alias-target")],
        "identifier string, uri string",
    )
    comps2 = connected_components(
        alias_edges_from_lineage(lineage.unionByName(alias))
    )
    rewritten = canonicalize_triples(triples, comps2)
    canon = min(some["uri"], "uri:alias-target")
    other = max(some["uri"], "uri:alias-target")
    assert rewritten.filter(F.col("subj") == other).count() == 0
    assert (
        rewritten.filter(F.col("subj") == canon).count()
        >= triples.filter(F.col("subj") == some["uri"]).count()
    )
