# -*- coding: utf-8 -*-
"""SHACL-lite shape validation (operators/shacl.py)."""
import pytest

from rdf_converter_spark.operators.shacl import RDF_TYPE, shacl_report

T = [
    # subj, pred, obj, obj_is_uri, obj_lang, obj_datatype
    ("p1", RDF_TYPE, "Person", True, None, None),
    ("p1", "name", "Alice", False, None, None),
    ("p1", "home", "http://x/h1", True, None, None),
    ("p1", "age", "30", False, None, "xsd:integer"),
    ("p2", RDF_TYPE, "Person", True, None, None),
    ("p2", "name", "Bob", False, None, None),
    ("p2", "name", "Bobby", False, None, None),      # maxCount 1 breach
    ("p2", "home", "not-a-uri", False, None, None),  # nodeKind breach
    ("p2", "age", "nan", False, None, None),         # pattern+datatype breach
    ("p3", RDF_TYPE, "Person", True, None, None),    # minCount name breach
    ("p3", "color", "purple", False, None, None),    # 'in' breach
    ("x1", RDF_TYPE, "Robot", True, None, None),     # not targeted
    ("x1", "color", "purple", False, None, None),
]

SHAPES = [{
    "shape": "PersonShape",
    "target_class": "Person",
    "property": [
        {"path": "name", "min_count": 1, "max_count": 1},
        {"path": "home", "node_kind": "IRI"},
        {"path": "age", "pattern": r"^\d+$", "datatype": "xsd:integer"},
        {"path": "color", "in": ["red", "blue"]},
    ],
}]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        T, "subj string, pred string, obj string, obj_is_uri boolean, "
           "obj_lang string, obj_datatype string")


def test_violations(triples):
    rep = shacl_report(triples, SHAPES)
    got = {(r.focus, r.path, r.constraint, r.value) for r in rep.collect()}
    assert got == {
        ("p2", "name", "maxCount", "2"),
        ("p2", "home", "nodeKind", "not-a-uri"),
        ("p2", "age", "pattern", "nan"),
        ("p2", "age", "datatype", "nan"),
        ("p3", "name", "minCount", "0"),
        ("p3", "color", "in", "purple"),
    }
    # untargeted class never validated
    assert not any(r.focus == "x1" for r in rep.collect())


def test_conformant_graph_empty_report(spark):
    t = spark.createDataFrame(
        [("p1", RDF_TYPE, "Person", True, None, None),
         ("p1", "name", "Alice", False, None, None)],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_datatype string")
    rep = shacl_report(t, [{
        "shape": "S", "target_class": "Person",
        "property": [{"path": "name", "min_count": 1, "max_count": 1}],
    }])
    assert rep.count() == 0


def test_validation_errors(triples):
    with pytest.raises(ValueError, match="no shapes"):
        shacl_report(triples, [])
    with pytest.raises(ValueError, match="target_class"):
        shacl_report(triples, [{"shape": "S"}])
    with pytest.raises(ValueError, match="unsupported"):
        shacl_report(triples, [{
            "shape": "S", "target_class": "Person",
            "property": [{"path": "name", "min_len": 3}],
        }])
    with pytest.raises(ValueError, match="node_kind"):
        shacl_report(triples, [{
            "shape": "S", "target_class": "Person",
            "property": [{"path": "home", "node_kind": "BNode"}],
        }])
    with pytest.raises(ValueError, match="no property constraints"):
        shacl_report(triples, [{"shape": "S", "target_class": "Person"}])


def test_no_cartesian_no_window(triples):
    rep = shacl_report(triples, SHAPES)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Window" not in plan


def test_named_graph_duplicates_count_once(spark):
    """A triple repeated across named graphs (pa/ld/...) is ONE value
    in the merged data graph: maxCount must not fire on quad
    multiplicity (the job.py deployment regression), while a REAL
    second value still does."""
    rows = [
        ("c1", RDF_TYPE, "Channel", True, None, None, "pa"),
        ("c1", RDF_TYPE, "Channel", True, None, None, "ld"),
        ("c1", "id", "C1", False, None, None, "pa"),
        ("c1", "id", "C1", False, None, None, "ld"),
        ("c1", "id", "C1", False, None, None, "ld_sujets"),
        ("c2", RDF_TYPE, "Channel", True, None, None, "pa"),
        ("c2", "id", "C2", False, None, None, "pa"),
        ("c2", "id", "c2-alt", False, None, None, "pa"),  # real dup
    ]
    quads = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean,"
        " obj_lang string, obj_datatype string, graph string",
    )
    rep = shacl_report(quads, [{
        "shape": "ChannelShape", "target_class": "Channel",
        "property": [{"path": "id", "min_count": 1, "max_count": 1}],
    }]).collect()
    assert [(r["focus"], r["constraint"], r["value"]) for r in rep] == [
        ("c2", "maxCount", "2")]
