# -*- coding: utf-8 -*-
"""SPARQL property paths (operators/paths.py).

Semantics mirror rdflib's SPARQL path evaluation over the reference's
emitted graphs (sequence / alternation / inverse / one-or-more).
"""
import pytest

from rdf_converter_spark.operators.paths import path_match

TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("a", "name", "Alice"),
    ("b", "name", "Bob"),
    ("d", "name", "Dave"),
    ("a", "likes", "d"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def test_sequence_path(triples):
    out = path_match(triples, "?x", "knows/name", "?n")
    # a knows b (named Bob); c knows d (named Dave); b knows c (no name)
    assert _pairs(out) == [("a", "Bob"), ("c", "Dave")]


def test_alternation_path(triples):
    out = path_match(triples, "a", "knows|likes", "?y")
    assert sorted(r.y for r in out.collect()) == ["b", "d"]


def test_inverse_path(triples):
    out = path_match(triples, "?x", "^knows", "a")
    assert [r.x for r in out.collect()] == ["b"]


def test_inverse_in_sequence(triples):
    # who shares a known-person with a?  a knows b, ^knows back: just a
    out = path_match(triples, "a", "knows/^knows", "?peer")
    assert sorted(r.peer for r in out.collect()) == ["a"]


def test_plus_converges_to_exact_closure(triples):
    out = path_match(triples, "a", "knows+", "?y")
    assert sorted(r.y for r in out.collect()) == ["b", "c", "d"]


def test_plus_grouped_alternation(triples):
    out = path_match(triples, "a", "(knows|likes)+", "?y")
    assert sorted(r.y for r in out.collect()) == ["b", "c", "d"]


def test_angle_bracket_iris(triples, spark):
    t = spark.createDataFrame(
        [("s", "http://x/p", "m"), ("m", "http://x/q", "o")],
        ["subj", "pred", "obj"],
    )
    out = path_match(t, "?a", "<http://x/p>/<http://x/q>", "?b")
    assert _pairs(out) == [("s", "o")]


def test_repeated_variable_filters_equality(triples, spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("c", "p", "d")],
        ["subj", "pred", "obj"],
    )
    # ?x p/p ?x -> two-step cycles back to self
    out = path_match(t, "?x", "p/p", "?x")
    assert sorted(r.x for r in out.collect()) == ["a", "b"]


def test_constant_endpoints_raise(triples):
    with pytest.raises(ValueError, match="no bindings"):
        path_match(triples, "a", "knows", "b")


NODES = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})


def test_star_includes_identity_and_closure(triples):
    out = path_match(triples, "?x", "knows*", "?y")
    got = set(_pairs(out))
    # zero-length: every term in the graph self-matches (incl. the
    # literal names — SPARQL's node universe is all terms)
    assert {(n, n) for n in NODES} <= got
    # plus-closure on top
    assert {("a", "b"), ("a", "c"), ("a", "d"), ("b", "d")} <= got
    assert ("a", "Alice") not in got  # star of knows only


def test_star_with_constant_endpoint(triples):
    out = path_match(triples, "a", "knows*", "?y")
    assert sorted(r.y for r in out.collect()) == ["a", "b", "c", "d"]


def test_star_constant_absent_from_graph_self_matches(triples):
    out = path_match(triples, "ghost", "knows*", "?y")
    assert [r.y for r in out.collect()] == ["ghost"]
    # non-nullable path: absent constant matches nothing
    out2 = path_match(triples, "ghost", "knows+", "?y")
    assert out2.count() == 0


def test_opt_zero_or_one(triples):
    out = path_match(triples, "a", "likes?", "?y")
    assert sorted(r.y for r in out.collect()) == ["a", "d"]


def test_seq_with_nullable_tail(triples):
    # knows/knows* = one-or-more knows
    out = path_match(triples, "a", "knows/knows*", "?y")
    assert sorted(r.y for r in out.collect()) == ["b", "c", "d"]


def test_negated_property_set_forward(triples):
    out = path_match(triples, "a", "!(knows|name)", "?y")
    assert sorted(r.y for r in out.collect()) == ["d"]  # likes only


def test_negated_property_set_bare_and_inverse(triples):
    # bare !p : any forward edge except p
    out = path_match(triples, "a", "!name", "?y")
    assert sorted(r.y for r in out.collect()) == ["b", "d"]
    # inverse-only NPS: ONLY reversed edges, pred not in {likes}
    out2 = path_match(triples, "b", "!(^likes)", "?y")
    assert sorted(r.y for r in out2.collect()) == ["a"]
    # mixed: forward non-knows (name) ∪ reversed non-knows (^likes)
    out3 = path_match(triples, "d", "!(knows|^knows)", "?y")
    assert sorted(r.y for r in out3.collect()) == ["Dave", "a"]


def test_malformed_paths_raise(triples):
    with pytest.raises(ValueError, match="empty property path"):
        path_match(triples, "?x", "  ", "?y")
    with pytest.raises(ValueError):
        path_match(triples, "?x", "(knows", "?y")
    with pytest.raises(ValueError, match="unterminated"):
        path_match(triples, "?x", "<http://x/p", "?y")
    with pytest.raises(ValueError, match="trailing"):
        path_match(triples, "?x", "knows)x", "?y")


def test_bounded_plus_on_long_chain(spark):
    # 40-node chain with max_rounds=2 -> paths of length <= 4 only
    rows = [("n%02d" % i, "next", "n%02d" % (i + 1)) for i in range(40)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = path_match(t, "n00", "next+", "?y", max_rounds=2)
    assert sorted(r.y for r in out.collect()) == [
        "n01", "n02", "n03", "n04"]


def test_no_cartesian_plan(triples):
    out = path_match(triples, "?x", "knows/name", "?n")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
