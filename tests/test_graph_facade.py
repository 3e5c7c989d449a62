# -*- coding: utf-8 -*-
"""SparkGraph — the rdflib-Graph-shaped façade (graph.py): query /
triples / membership / functional add-remove-update / parse /
serialize round trip."""

import pytest

from rdf_converter_spark.graph import SparkGraph

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
EX = "http://ex.org/"


@pytest.fixture()
def g(spark):
    rows = [
        (EX + "alice", RDF_TYPE, EX + "Person", True, None, None),
        (EX + "alice", EX + "name", "Alice", False, None, None),
        (EX + "alice", EX + "knows", EX + "bob", True, None, None),
        (EX + "bob", RDF_TYPE, EX + "Person", True, None, None),
        (EX + "bob", EX + "name", "Bob", False, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string",
    )
    return SparkGraph(df)


def test_len_contains_value(g):
    assert len(g) == 5
    assert (EX + "alice", EX + "name", "Alice") in g
    assert (EX + "alice", EX + "name", "Bob") not in g
    assert g.value(EX + "bob", EX + "name") == "Bob"
    assert g.value(EX + "bob", EX + "missing") is None


def test_triples_pattern_iteration(g):
    got = set(g.triples((None, RDF_TYPE, None)))
    assert got == {
        (EX + "alice", RDF_TYPE, EX + "Person"),
        (EX + "bob", RDF_TYPE, EX + "Person"),
    }
    assert set(g.triples((EX + "alice", EX + "name", None))) == {
        (EX + "alice", EX + "name", "Alice")}


def test_query_select_and_ask(g):
    df = g.query("""
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE { ?p a ex:Person ; ex:name ?n }
    """)
    assert {r.n for r in df.collect()} == {"Alice", "Bob"}
    assert g.query(
        "PREFIX ex: <http://ex.org/> ASK { ?x ex:knows ?y }") is True


def test_functional_add_remove(g):
    g2 = g.add((EX + "carol", EX + "name", "Carol"))
    assert len(g2) == 6 and len(g) == 5  # original untouched
    g3 = g2.add((EX + "carol", EX + "name", "Carol"))
    assert len(g3) == 6  # set semantics
    g4 = g3.remove((None, EX + "name", None))
    assert len(g4) == 3
    assert (EX + "bob", EX + "name", "Bob") not in g4


def test_update_string(g):
    g2 = g.update("""
        PREFIX ex: <http://ex.org/>
        INSERT DATA { ex:dave a ex:Person }
    """)
    assert (EX + "dave", RDF_TYPE, EX + "Person") in g2
    with pytest.raises(ValueError, match="Update"):
        g.update("SELECT ?s WHERE { ?s ?p ?o }")


def test_graph_union(g):
    other = SparkGraph(g.df.sparkSession.createDataFrame(
        [(EX + "alice", RDF_TYPE, EX + "Person", True, None, None),
         (EX + "zed", EX + "name", "Zed", False, None, None)],
        g.df.schema))
    merged = g + other
    assert len(merged) == 6  # dup alice-type collapses


def test_serialize_parse_roundtrip(g, spark, tmp_path):
    nt = str(tmp_path / "g.nt")
    g.serialize(nt, format="nt")
    back = SparkGraph.parse(spark, nt, format="nt")
    assert set(back.triples()) == set(g.triples())
    ttl = str(tmp_path / "g.ttl")
    n = g.serialize(ttl, format="turtle")
    assert n == 5
    text = open(ttl).read()
    lines = text.split("\n")
    assert lines[0].startswith("@prefix")
    # subjects are grouped (one block per subject, ';' continuation)
    assert text.count("<" + EX + "alice>") == 1
    assert " ;" in text and '"Alice"' in text
    # distributed turtle output is an explicit unsupported combo
    with pytest.raises(ValueError, match="distributed"):
        g.serialize(ttl, format="turtle", distributed=True)


def test_full_term_identity_lang_variants(spark):
    from rdf_converter_spark.graph import SparkGraph as G

    base = G(spark.createDataFrame(
        [(EX + "s", EX + "p", "x", False, "en", None)],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string"))
    # "x"@fr is a DISTINCT triple from "x"@en — both survive a union
    other = G(spark.createDataFrame(
        [(EX + "s", EX + "p", "x", False, "fr", None)], base.df.schema))
    assert len(base + other) == 2
    # a plain (untagged) "x" is distinct again, and adding it twice
    # is a no-op (null-safe identity join)
    g2 = base.add((EX + "s", EX + "p", "x"))
    assert len(g2) == 2
    assert len(g2.add((EX + "s", EX + "p", "x"))) == 2


def test_obj_is_uri_heuristic_requires_scheme(spark):
    from rdf_converter_spark.graph import SparkGraph as G

    g = G(spark.createDataFrame(
        [("http://s", "http://p", "http error 404"),
         ("http://s", "http://p", "https://real/iri")],
        "subj string, pred string, obj string"))
    flags = {r.obj: r.obj_is_uri for r in g.df.collect()}
    assert flags == {"http error 404": False, "https://real/iri": True}


def test_missing_flag_columns_defaulted(spark):
    df = spark.createDataFrame(
        [("http://s", "http://p", "http://o"),
         ("http://s", "http://p", "lit")],
        "subj string, pred string, obj string")
    g = SparkGraph(df)
    flags = {r.obj: r.obj_is_uri for r in g.df.collect()}
    assert flags == {"http://o": True, "lit": False}
    with pytest.raises(ValueError, match="missing"):
        SparkGraph(df.select("subj", "pred"))
