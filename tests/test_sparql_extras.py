# -*- coding: utf-8 -*-
"""SPARQL aggregates, solution modifiers, VALUES, ASK, DESCRIBE
(operators/bgp.py), owl:sameAs smushing (operators/owl.py) and VoID
statistics (operators/void.py)."""
import pytest
from pyspark.sql import functions as F

from rdf_converter_spark.operators.bgp import (
    ask, bgp_aggregate, bgp_match, describe, solution_modifiers,
)

TRIPLES = [
    ("a", "type", "Person"),
    ("b", "type", "Person"),
    ("c", "type", "Place"),
    ("a", "knows", "b"),
    ("b", "knows", "a"),
    ("b", "knows", "c"),
    ("a", "name", "Alice"),
    ("b", "name", "Bob"),
    ("c", "name", "Cave"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


# ---------------------------------------------------------------- VALUES

def test_values_constrains_shared_var(triples):
    out = bgp_match(
        triples, [("?s", "type", "?t")],
        values=[{"s": "a"}, {"s": "c"}],
    )
    assert sorted((r.s, r.t) for r in out.collect()) == [
        ("a", "Person"), ("c", "Place")]


def test_values_new_var_cross_joins(triples):
    out = bgp_match(
        triples, [("?s", "type", "Place")],
        values=[{"tag": "x"}, {"tag": "y"}],
    )
    assert sorted((r.s, r.tag) for r in out.collect()) == [
        ("c", "x"), ("c", "y")]


def test_values_rejects_ragged_rows(triples):
    with pytest.raises(ValueError, match="VALUES"):
        bgp_match(triples, [("?s", "type", "?t")],
                  values=[{"s": "a"}, {"t": "Person"}])


# ------------------------------------------------------------ aggregates

def test_group_by_count(triples):
    out = bgp_aggregate(
        triples, [("?s", "knows", "?o")],
        group_by=["?s"], aggregates={"n": "COUNT(*)"},
    )
    assert sorted((r.s, r.n) for r in out.collect()) == [("a", 1), ("b", 2)]


def test_implicit_group_and_distinct_agg(triples):
    out = bgp_aggregate(
        triples, [("?s", "type", "?t")],
        group_by=[], aggregates={
            "n": "COUNT(*)", "types": "COUNT(DISTINCT ?t)"},
    )
    row = out.collect()[0]
    assert (row.n, row.types) == (3, 2)


def test_having_filters_groups(triples):
    out = bgp_aggregate(
        triples, [("?s", "knows", "?o")],
        group_by=["?s"], aggregates={"n": "COUNT(*)"},
        having="?n > 1",
    )
    assert [(r.s, r.n) for r in out.collect()] == [("b", 2)]


def test_aggregate_unbound_var_raises(triples):
    with pytest.raises(ValueError, match="unbound"):
        bgp_aggregate(triples, [("?s", "knows", "?o")],
                      group_by=["?s"], aggregates={"n": "SUM(?zzz)"})


# ------------------------------------------------------------- modifiers

def test_order_limit_offset(triples):
    sol = bgp_match(triples, [("?s", "name", "?n")])
    out = solution_modifiers(sol, order_by=["?n"], limit=2, offset=1)
    assert [r.n for r in out.collect()] == ["Bob", "Cave"]


def test_order_desc_and_distinct(triples):
    sol = bgp_match(triples, [("?s", "type", "?t")]).select("t")
    out = solution_modifiers(sol, distinct=True, order_by=["-?t"])
    assert [r.t for r in out.collect()] == ["Place", "Person"]


def test_offset_without_order_raises(triples):
    sol = bgp_match(triples, [("?s", "name", "?n")])
    with pytest.raises(ValueError, match="OFFSET"):
        solution_modifiers(sol, offset=1)


def test_order_by_unknown_var_raises(triples):
    sol = bgp_match(triples, [("?s", "name", "?n")])
    with pytest.raises(ValueError, match="ORDER BY"):
        solution_modifiers(sol, order_by=["?zzz"])


def test_order_limit_compiles_to_take_ordered(triples):
    sol = bgp_match(triples, [("?s", "name", "?n")])
    plan = solution_modifiers(
        sol, order_by=["?n"], limit=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------ ASK / DESCRIBE

def test_ask(triples):
    assert ask(triples, [("?s", "type", "Place")]) is True
    assert ask(triples, [("?s", "type", "Robot")]) is False


def test_describe_outgoing_and_incoming(spark):
    rows = [
        ("a", "type", "Person", True),
        ("a", "name", "Alice", False),
        ("b", "knows", "a", True),
        ("b", "name", "Bob", False),
    ]
    t = spark.createDataFrame(
        rows, ["subj", "pred", "obj", "obj_is_uri"])
    out = describe(t, [("?s", "type", "Person")], "?s")
    assert sorted((r.subj, r.pred) for r in out.collect()) == [
        ("a", "name"), ("a", "type")]
    inc = describe(t, [("?s", "type", "Person")], "?s", incoming=True)
    assert sorted((r.subj, r.pred) for r in inc.collect()) == [
        ("a", "name"), ("a", "type"), ("b", "knows")]


# ------------------------------------------------------------- UPDATE

def test_update_where_delete_insert(spark):
    from rdf_converter_spark.operators.bgp import update_where

    rows = [
        ("a", "type", "Person", False, None, None),
        ("a", "status", "active", False, None, None),
        ("b", "type", "Person", False, None, None),
        ("c", "type", "Place", False, None, None),
        ("c", "status", "active", False, None, None),  # not a Person: kept
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string",
    )
    new = update_where(
        t,
        where=[("?s", "type", "Person")],
        delete=[("?s", "status", "active")],
        insert=[("?s", "status", "archived"),
                ("?s", "archivedBy", "http://x/job", True)],
    )
    got = sorted((r.subj, r.pred, r.obj, r.obj_is_uri)
                 for r in new.collect())
    assert got == [
        ("a", "archivedBy", "http://x/job", True),
        ("a", "status", "archived", False),
        ("a", "type", "Person", False),
        ("b", "archivedBy", "http://x/job", True),
        ("b", "status", "archived", False),
        ("b", "type", "Person", False),
        ("c", "status", "active", False),
        ("c", "type", "Place", False),
    ]


def test_update_where_insert_is_set_semantics(spark):
    from rdf_converter_spark.operators.bgp import update_where

    t = spark.createDataFrame(
        [("a", "type", "Person", False, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string",
    )
    # inserting an already-present triple must not duplicate it
    new = update_where(
        t, where=[("?s", "type", "Person")],
        insert=[("?s", "type", "Person")],
    )
    assert new.count() == 1


def test_update_where_needs_a_template(spark):
    from rdf_converter_spark.operators.bgp import update_where

    t = spark.createDataFrame(
        [("a", "type", "Person")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="template"):
        update_where(t, where=[("?s", "type", "Person")])


# ---------------------------------------------------------------- sameAs

def test_sameas_smush_merges_chains(spark):
    from rdf_converter_spark.operators.owl import OWL_SAMEAS, sameas_smush

    rows = [
        # chain a = b = c must merge transitively onto 'a'
        ("b", OWL_SAMEAS, "a", True, None, None),
        ("b", OWL_SAMEAS, "c", True, None, None),
        ("a", "name", "Alpha", False, None, None),
        ("b", "name", "Alpha", False, None, None),   # collapses with ^
        ("c", "worksAt", "d", True, None, None),
        ("e", "knows", "b", True, None, None),       # URI object rewritten
        ("f", "name", "b", False, None, None),       # literal 'b' untouched
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string",
    )
    out = sameas_smush(t)
    got = sorted((r.subj, r.pred, r.obj) for r in out.collect())
    assert got == [
        ("a", "name", "Alpha"),
        ("a", "worksAt", "d"),
        ("e", "knows", "a"),
        ("f", "name", "b"),
    ]
    kept = sameas_smush(t, keep_sameas=True)
    sa = [(r.subj, r.obj) for r in kept.collect() if r.pred == OWL_SAMEAS]
    assert sa == [("a", "a")]  # reflexive canonical self-loop only


# ------------------------------------------------------------------ VoID

def test_void_stats_sections(spark):
    from rdf_converter_spark.operators.void import RDF_TYPE, void_stats

    rows = [
        ("a", RDF_TYPE, "Person"),
        ("b", RDF_TYPE, "Person"),
        ("a", "knows", "b"),
        ("a", "name", "Alice"),
        ("b", "name", "Alice"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = {(r.section, r.key): r for r in void_stats(t).collect()}

    ds = out[("dataset", "(all)")]
    assert (ds.triples, ds.distinct_subjects, ds.distinct_objects) == (
        5, 2, 3)
    nm = out[("property", "name")]
    assert (nm.triples, nm.distinct_subjects, nm.distinct_objects) == (
        2, 2, 1)
    cp = out[("class", "Person")]
    # class partition = ALL triples whose subject is a Person instance
    assert (cp.triples, cp.distinct_subjects) == (5, 2)
    # approx path returns the same shape (values are estimates)
    approx = void_stats(t, approx=True)
    assert approx.columns == out[("dataset", "(all)")].__fields__
