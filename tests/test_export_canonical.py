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


def _parse_turtle(text):
    """Minimal Turtle reader for the round-trip test: @prefix lines,
    subject grouping with ';' and ',', qnames, <uri>, literals with
    @lang / ^^dt. Returns the (s, p, o, is_uri, lang, dt) set."""
    import re

    prefixes = {}
    triples = set()

    def expand(tok):
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, local = tok.split(":", 1)
        return prefixes[pfx] + local

    def parse_obj(tok):
        m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([\w-]+)|\^\^(\S+))?$', tok)
        if m:
            lit = (
                m.group(1)
                .replace("\\n", "\n").replace("\\r", "\r")
                .replace("\\t", "\t").replace('\\"', '"')
                .replace("\\\\", "\\")
            )
            dt = expand(m.group(3)) if m.group(3) else None
            return (lit, False, m.group(2), dt)
        return (expand(tok), True, None, None)

    # tokenize statements: split on ' .' at line ends outside literals
    body = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("@prefix"):
            m = re.match(r"@prefix\s+(\w+):\s+<([^>]*)>\s*\.", line)
            prefixes[m.group(1)] = m.group(2)
        else:
            body.append(line)
    stmt = " ".join(body)
    tok_re = re.compile(
        # <IRI> first: IRIREFs may legally contain ',' / ';' (e.g. the
        # yle genre URI .../erotic,_sex) and must tokenize atomically
        r'<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[\w-]+|\^\^\S+)?|[;,.]|[^\s;,]+'
    )
    subj = pred = None
    expect = "subj"
    for tok in tok_re.findall(stmt):
        if tok == ";":
            expect = "pred"
            continue
        if tok == ",":
            expect = "obj"
            continue
        if tok == ".":
            expect = "subj"
            continue
        if expect == "subj":
            subj, expect = expand(tok), "pred"
        elif expect == "pred":
            pred, expect = expand(tok), "obj"
        elif expect == "obj":
            o, u, lg, dt = parse_obj(tok)
            triples.add((subj, pred, o, u, lg, dt))
            expect = "sep"
    return triples


def test_to_turtle_pretty_roundtrip(spark, tmp_path):
    """Real Turtle output: prefix bindings render, qnames compress,
    and a reader recovers the exact triple set."""
    from rdf_converter_spark.operators.export import to_turtle_pretty

    eb = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#"
    rows = [
        ("http://data.memad.eu/x/1", eb + "title", "Tit\"le\nA",
         False, "fr", None),
        ("http://data.memad.eu/x/1", eb + "title", "Title B",
         False, "en", None),
        ("http://data.memad.eu/x/1",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         eb + "TVProgramme", True, None, None),
        ("http://data.memad.eu/x/1", eb + "dateBroadcast", "2019-05-14",
         False, None, "http://www.w3.org/2001/XMLSchema#date"),
        ("http://other.example/item?q=1", eb + "hasPart",
         "http://data.memad.eu/x/1", True, None, None),
        ("http://other.example/with space", eb + "hasPart",
         "http://data.memad.eu/x/1", True, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean,"
        "obj_lang string, obj_datatype string",
    )
    p = str(tmp_path / "g.ttl")
    assert to_turtle_pretty(df, p) == 6
    text = open(p).read()
    assert "@prefix ebucore: <%s> ." % eb in text
    assert "ebucore:title" in text
    assert "rdf:type ebucore:TVProgramme" in text
    assert '^^xsd:date' in text
    assert "<http://other.example/item?q=1>" in text  # un-qnameable
    # malformed IRIs (space) are %-encoded to keep the file parseable
    assert "<http://other.example/with%20space>" in text
    got = _parse_turtle(text)
    want = {tuple(r) for r in rows}
    want = {
        (s.replace(" ", "%20"), p_, o, u, lg, dt)
        for s, p_, o, u, lg, dt in want
    }
    assert got == want
    # determinism regardless of input order
    p2 = str(tmp_path / "g2.ttl")
    to_turtle_pretty(df.orderBy("pred"), p2)
    assert open(p2).read() == text


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


def test_to_turtle_distributed_escapes_control_chars(spark, tmp_path):
    """VERDICT r03 #3: the SCALE path must escape \\n/\\r/\\t exactly
    like the driver-side formatter — a PA note with a newline used to
    produce a broken multi-line N-Triples statement there only. Round
    trip: distributed output parses back to the original literals and
    matches format_triple line-for-line."""
    from rdf_converter_spark.operators.export import (
        format_triple, to_turtle_distributed,
    )

    rows = [
        ("u:1", "p", 'line1\nline2\t"quoted" \\ tail\rend', False,
         None, None),
        ("u:2", "p", "plain", False, "fr", None),
        ("u:3", "p", "u:ref", True, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean,"
        "obj_lang string, obj_datatype string",
    )
    out = str(tmp_path / "nt_esc")
    to_turtle_distributed(df, out)
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            lines += open(os.path.join(out, f)).read().splitlines()
    # one PHYSICAL line per triple even with embedded newlines
    assert len(lines) == 3
    assert sorted(lines) == sorted(format_triple(*r) for r in rows)
    # and the parser recovers the original control characters
    parsed = _parse_turtle("\n".join(lines))
    assert ('u:1', 'p', 'line1\nline2\t"quoted" \\ tail\rend',
            False, None, None) in parsed


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


def test_driver_side_writers_refuse_above_collect_cap(spark, tmp_path,
                                                      monkeypatch):
    """to_turtle / to_turtle_pretty are fixture-scale tools: above
    COLLECT_CAP they must refuse (pointing at to_turtle_distributed)
    instead of OOMing the driver (VERDICT r02 #5)."""
    import pytest
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators import export

    monkeypatch.setattr(export, "COLLECT_CAP", 50)
    df = spark.range(51).select(
        F.concat(F.lit("http://x/s"), F.col("id")).alias("subj"),
        F.lit("http://x/p").alias("pred"),
        F.lit("o").alias("obj"),
        F.lit(False).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    with pytest.raises(ValueError, match="to_turtle_distributed"):
        export.to_turtle(df, str(tmp_path / "a.nt"))
    with pytest.raises(ValueError, match="to_turtle_distributed"):
        export.to_turtle_pretty(df, str(tmp_path / "a.ttl"))
    # at the cap exactly, both still write
    monkeypatch.setattr(export, "COLLECT_CAP", 51)
    assert export.to_turtle(df, str(tmp_path / "b.nt")) == 51
