# -*- coding: utf-8 -*-
"""SPARQL text front-end (operators/sparql_text.py): the string ->
pattern-list lowering must execute the same semantics the Python API
exposes — verified per feature against hand-built expected sets."""

import pytest

from rdf_converter_spark.operators.sparql_text import (
    SparqlSyntaxError, parse_query, sparql_query,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
EX = "http://ex.org/"


@pytest.fixture()
def kg(spark):
    rows = [
        (EX + "alice", RDF_TYPE, EX + "Person", True),
        (EX + "alice", EX + "name", "Alice", False),
        (EX + "alice", EX + "age", "34", False),
        (EX + "alice", EX + "knows", EX + "bob", True),
        (EX + "bob", RDF_TYPE, EX + "Person", True),
        (EX + "bob", EX + "name", "Bob", False),
        (EX + "bob", EX + "age", "7", False),
        (EX + "carol", RDF_TYPE, EX + "Robot", True),
        (EX + "carol", EX + "name", "Carol", False),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean"
    )


def _set(df):
    return {tuple(r) for r in df.collect()}


def test_select_basic_prefix_and_a(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?p ?n WHERE { ?p a ex:Person ; ex:name ?n . }
    """)
    assert _set(out) == {(EX + "alice", "Alice"), (EX + "bob", "Bob")}


def test_filter_regex_and_comparison(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE {
          ?p ex:name ?n ; ex:age ?a .
          FILTER (regex(?n, "^A") || CAST(?a AS INT) < 10)
        }
    """)
    assert _set(out) == {("Alice",), ("Bob",)}


def test_optional_null_and_bound(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?p ?k WHERE {
          ?p a ex:Person .
          OPTIONAL { ?p ex:knows ?k }
        }
    """)
    assert _set(out) == {
        (EX + "alice", EX + "bob"), (EX + "bob", None)}


def test_union(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?p WHERE {
          { ?p a ex:Robot } UNION { ?p ex:knows ?o }
        }
    """)
    assert _set(out) == {(EX + "carol",), (EX + "alice",)}


def test_values_and_bind(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n ?tag WHERE {
          ?p ex:name ?n .
          VALUES ?n { "Alice" "Carol" }
          BIND (CONCAT(?n, "!") AS ?tag)
        }
    """)
    assert _set(out) == {("Alice", "Alice!"), ("Carol", "Carol!")}


def test_minus_and_not_exists(kg):
    base = """
        PREFIX ex: <http://ex.org/>
        SELECT ?p WHERE {
          ?p a ex:Person .
          %s { ?p ex:knows ?x }
        }
    """
    for clause in ("MINUS", "FILTER NOT EXISTS"):
        out = sparql_query(kg, base % clause)
        assert _set(out) == {(EX + "bob",)}, clause


def test_aggregate_group_by_having(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?t (COUNT(*) AS ?n) WHERE {
          ?p a ?t .
        } GROUP BY ?t HAVING (COUNT(*) >= 2)
    """)
    assert _set(out) == {(EX + "Person", 2)}


def test_group_concat_separator(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT (GROUP_CONCAT(?n; SEPARATOR="|") AS ?ns) WHERE {
          ?p a ex:Person ; ex:name ?n .
        }
    """)
    assert _set(out) == {("Alice|Bob",)}


def test_order_limit_offset(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE { ?p ex:name ?n }
        ORDER BY DESC(?n) LIMIT 2 OFFSET 1
    """)
    assert [r.n for r in out.collect()] == ["Bob", "Alice"]


def test_distinct(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT DISTINCT ?t WHERE { ?p a ?t }
    """)
    assert _set(out) == {(EX + "Person",), (EX + "Robot",)}


def test_ask(kg):
    q = "PREFIX ex: <http://ex.org/> ASK { ?p a ex:%s }"
    assert sparql_query(kg, q % "Robot") is True
    assert sparql_query(kg, q % "Dragon") is False


def test_construct(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        CONSTRUCT { ?p ex:label ?n } WHERE { ?p a ex:Robot ; ex:name ?n }
    """)
    assert _set(out) == {(EX + "carol", EX + "label", "Carol")}


def test_comments_and_dollar_vars(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>  # prologue comment
        SELECT $n WHERE {
          $p ex:name $n .  # trailing comment
        }
    """)
    assert _set(out) == {("Alice",), ("Bob",), ("Carol",)}


@pytest.mark.parametrize("bad, msg", [
    ("SELECT ?x WHERE { ?x foaf:name ?n }", "undeclared prefix"),
    ("SELECT WHERE { ?x ?p ?o }", "projection"),
    ("PREFIX ex: <http://ex.org/> SELECT ?x WHERE "
     "{ VALUES ?x { UNDEF } }", "UNDEF"),
    ("PREFIX ex: <http://ex.org/> SELECT ?x WHERE "
     "{ GRAPH ex:g { ?x a ex:Person } }", "without a 'graph' column"),
    ("PREFIX ex: <http://ex.org/> SELECT ?x WHERE "
     "{ OPTIONAL { ?x ex:knows+ ?y } }", "property paths"),
    ("PREFIX ex: <http://ex.org/> SELECT ?x ?y WHERE "
     "{ ?x a ex:Person . ?y a ex:Robot }", "cartesian"),
])
def test_errors(kg, bad, msg):
    with pytest.raises((SparqlSyntaxError, ValueError), match=msg):
        df = sparql_query(kg, bad)
        if hasattr(df, "collect"):
            df.collect()


def test_path_plus_and_sequence(kg):
    # alice knows bob; with a bob->carol edge, knows+ reaches both
    extra = kg.sparkSession.createDataFrame(
        [(EX + "bob", EX + "knows", EX + "carol", True)],
        kg.schema)
    g = kg.unionByName(extra)
    out = sparql_query(g, """
        PREFIX ex: <http://ex.org/>
        SELECT ?r WHERE { ex:alice ex:knows+ ?r }
    """)
    assert _set(out) == {(EX + "bob",), (EX + "carol",)}
    out2 = sparql_query(g, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE { ex:alice ex:knows/ex:name ?n }
    """)
    assert _set(out2) == {("Bob",)}


def test_path_inverse_and_mixed_with_bgp(kg):
    # s ^p o matches iff o p s: bob ^knows ?p binds the knower
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?p ?n WHERE {
          ex:bob ^ex:knows ?p .
          ?p ex:name ?n .
        }
    """)
    assert _set(out) == {(EX + "alice", "Alice")}


def test_path_nps(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?o WHERE { ex:alice !(rdf:type|ex:name|ex:age) ?o }
    """)
    assert _set(out) == {(EX + "bob",)}


def test_path_zero_or_one(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?r WHERE { ex:alice ex:knows? ?r }
    """)
    assert _set(out) == {(EX + "alice",), (EX + "bob",)}


def test_describe_iri_and_var(kg):
    out = sparql_query(
        kg, "PREFIX ex: <http://ex.org/> DESCRIBE ex:carol")
    assert {(r.subj, r.pred, r.obj) for r in out.collect()} == {
        (EX + "carol", RDF_TYPE, EX + "Robot"),
        (EX + "carol", EX + "name", "Carol"),
    }
    out2 = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        DESCRIBE ?p WHERE { ?p a ex:Robot }
    """)
    assert {(r.subj, r.pred, r.obj) for r in out2.collect()} == {
        (EX + "carol", RDF_TYPE, EX + "Robot"),
        (EX + "carol", EX + "name", "Carol"),
    }


def test_parse_is_pure():
    spec = parse_query("""
        PREFIX ex: <http://ex.org/>
        SELECT ?s WHERE { ?s ex:p "lit with \\"quote\\"" } LIMIT 3
    """)
    assert spec["limit"] == 3
    assert spec["group"]["patterns"] == [
        ("?s", EX + "p", 'lit with "quote"')]


def test_graph_blocks(kg):
    quads = kg.withColumn(
        "graph",
        kg.subj.substr(15, 1),  # 'a'/'b'/'c' by subject first letter
    )
    from pyspark.sql import functions as F
    quads = kg.select(
        "*", F.when(F.col("subj").contains("alice"), "ga")
        .when(F.col("subj").contains("bob"), "gb")
        .otherwise("gc").alias("graph"))
    out = sparql_query(quads, """
        PREFIX ex: <http://ex.org/>
        SELECT ?g ?n WHERE {
          GRAPH ?g { ?p ex:name ?n }
        }
    """)
    assert _set(out) == {("ga", "Alice"), ("gb", "Bob"), ("gc", "Carol")}
    out2 = sparql_query(quads, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE {
          GRAPH <ga> { ?p ex:name ?n }
          GRAPH <ga> { ?p a ex:Person }
        }
    """)
    assert _set(out2) == {("Alice",)}


def test_graph_mixed_with_plain_raises(kg):
    from pyspark.sql import functions as F
    quads = kg.withColumn("graph", F.lit("g0"))
    with pytest.raises(SparqlSyntaxError, match="GRAPH"):
        sparql_query(quads, """
            PREFIX ex: <http://ex.org/>
            SELECT ?p WHERE {
              ?p a ex:Person .
              GRAPH <g0> { ?p ex:name ?n }
            }
        """)
    with pytest.raises(SparqlSyntaxError, match="graph"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            SELECT ?n WHERE { GRAPH <g0> { ?p ex:name ?n } }
        """)  # no graph column on the table


def test_subquery_in_where(kg):
    # inner SELECT finds the max age per type; outer joins names
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n ?m WHERE {
          ?p ex:name ?n ; ex:age ?m .
          { SELECT (MAX(CAST(?a AS INT)) AS ?m) WHERE {
              ?q ex:age ?a } }
          FILTER (CAST(?m AS INT) = 34)
        }
    """)
    # subquery binds ?m = 34 (max age); join on ?m keeps alice only
    # (the joined column keeps the OUTER side's string value)
    rows = _set(out)
    assert rows == {("Alice", "34")}


def test_insert_and_delete_data(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        INSERT DATA {
          ex:dave a ex:Person ; ex:name "Dave" .
          ex:alice ex:name "Alice" .
        }
    """)
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert (EX + "dave", RDF_TYPE, EX + "Person") in rows
    assert (EX + "dave", EX + "name", "Dave") in rows
    # duplicate insert is a no-op (set semantics)
    assert out.count() == kg.count() + 2
    # inserted IRI object carries the flag; literal does not
    flags = {r.obj: r.obj_is_uri for r in out.collect()
             if r.subj == EX + "dave"}
    assert flags == {EX + "Person": True, "Dave": False}

    out2 = sparql_query(out, """
        PREFIX ex: <http://ex.org/>
        DELETE DATA { ex:dave ex:name "Dave" }
    """)
    assert out2.count() == out.count() - 1


def test_delete_where_and_full_update(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        DELETE WHERE { ?p ex:age ?a }
    """)
    assert out.filter(out.pred == EX + "age").count() == 0
    assert out.count() == kg.count() - 2

    out2 = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        DELETE { ?p a ex:Robot }
        INSERT { ?p a ex:Droid . ?p ex:tag "retyped" }
        WHERE { ?p a ex:Robot }
    """)
    rows = {(r.subj, r.pred, r.obj) for r in out2.collect()}
    assert (EX + "carol", RDF_TYPE, EX + "Robot") not in rows
    assert (EX + "carol", RDF_TYPE, EX + "Droid") in rows
    assert (EX + "carol", EX + "tag", "retyped") in rows


def test_data_block_rejects_variables(kg):
    with pytest.raises(SparqlSyntaxError, match="variables"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            INSERT DATA { ?p ex:name "x" }
        """)


# --- review findings (round-5 code review): constructs that parse
# must either EXECUTE or RAISE — never silently drop ---------------

def test_construct_honors_filters(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        CONSTRUCT { ?p ex:senior "yes" } WHERE {
          ?p ex:age ?a . FILTER (CAST(?a AS INT) > 10)
        }
    """)
    assert _set(out) == {(EX + "alice", EX + "senior", "yes")}


def test_ask_honors_not_exists(kg):
    # every Person with knows also... bob has no knows edge, so the
    # NOT EXISTS must make this True; restricting to alice -> False
    q = """
        PREFIX ex: <http://ex.org/>
        ASK { ?p a ex:Person . %s
              FILTER NOT EXISTS { ?p ex:knows ?x } }
    """
    assert sparql_query(kg, q % "") is True
    assert sparql_query(
        kg, q % '?p ex:name "Alice" .') is False


def test_aggregate_honors_not_exists(kg):
    out = sparql_query(kg, """
        PREFIX ex: <http://ex.org/>
        SELECT (COUNT(*) AS ?n) WHERE {
          ?p a ex:Person .
          FILTER NOT EXISTS { ?p ex:knows ?x }
        }
    """)
    assert _set(out) == {(1,)}  # only bob


def test_construct_with_modifiers_raises(kg):
    with pytest.raises(SparqlSyntaxError, match="modifiers"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            CONSTRUCT { ?p ex:l ?n } WHERE { ?p ex:name ?n } LIMIT 2
        """)


def test_pattern_after_union_raises(kg):
    with pytest.raises(SparqlSyntaxError, match="UNION"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            SELECT ?p WHERE {
              { ?p a ex:Robot } UNION { ?p ex:knows ?o }
              ?p ex:name ?n .
            }
        """)


def test_union_branch_with_minus_raises(kg):
    with pytest.raises(SparqlSyntaxError, match="UNION branches"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            SELECT ?p WHERE {
              { ?p a ex:Person MINUS { ?p ex:knows ?x } }
              UNION { ?p a ex:Robot }
            }
        """)


def test_group_concat_distinct(kg):
    dup = kg.unionByName(kg.sparkSession.createDataFrame(
        [(EX + "dave", EX + "name", "Alice", False)], kg.schema))
    out = sparql_query(dup, """
        PREFIX ex: <http://ex.org/>
        SELECT (GROUP_CONCAT(DISTINCT ?n; SEPARATOR=",") AS ?ns)
        WHERE { ?p ex:name ?n . VALUES ?n { "Alice" "Bob" } }
    """)
    assert _set(out) == {("Alice,Bob",)}  # duplicate Alice collapsed


def test_unescape_backslash_sequences():
    from rdf_converter_spark.operators.sparql_text import _unescape

    # escaped backslash followed by a literal n must NOT become \n
    assert _unescape("C:\\\\network") == "C:\\network"
    assert _unescape('say \\"hi\\"\\n') == 'say "hi"\n'
    assert _unescape("tab\\there") == "tab\there"


# --- property tests (hypothesis): parse is a faithful inverse of
# rendering, and string literals round-trip through escaping --------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _IRIS = {"<http://x/a>": "http://x/a", "<http://x/b>": "http://x/b",
             "ex:c": EX + "c", "a": RDF_TYPE}
    _iri = st.sampled_from(sorted(_IRIS))
    _var = st.sampled_from(["?v1", "?v2", "?v3"])
    _subj = st.one_of(st.sampled_from(
        ["<http://x/a>", "<http://x/b>", "ex:c"]), _var)
    _obj = st.one_of(_iri, _var, st.just('"lit"'))
    _triple = st.tuples(_subj, _iri, _obj)

    def _expand(t):
        if t in _IRIS:
            return _IRIS[t]
        if t == '"lit"':
            return "lit"
        return t

    @settings(max_examples=60, deadline=None)
    @given(st.lists(_triple, min_size=1, max_size=4))
    def test_fuzz_pattern_parse_roundtrip(pats):
        text = ("PREFIX ex: <http://ex.org/> SELECT * WHERE { "
                + " . ".join(" ".join(t) for t in pats) + " }")
        spec = parse_query(text)
        assert spec["group"]["patterns"] == [
            tuple(_expand(t) for t in p) for p in pats]

    @settings(max_examples=80, deadline=None)
    @given(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               max_codepoint=0x2FF),
        max_size=25,
    ))
    def test_fuzz_string_literal_roundtrip(s):
        esc = (s.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r")
               .replace("\t", "\\t"))
        spec = parse_query(
            'SELECT ?x WHERE { ?x <http://p> "%s" }' % esc)
        assert spec["group"]["patterns"][0][2] == s
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass


def test_from_clause_raises(kg):
    with pytest.raises(SparqlSyntaxError, match="FROM"):
        sparql_query(kg, """
            PREFIX ex: <http://ex.org/>
            SELECT ?s FROM <http://ex.org/g> WHERE { ?s a ex:Person }
        """)
