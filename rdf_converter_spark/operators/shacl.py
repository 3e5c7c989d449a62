# -*- coding: utf-8 -*-
"""SHACL-lite: shape validation over materialized triple tables.

A triple factory needs a QA gate: the reference relies on Python
asserts inside its converters (``ld_converter.py:288``'s
``assert('Identifiant' in entry)`` etc.) which validate the INPUT
rows; once the graph is materialized there is nothing checking the
OUTPUT. This module implements the core of the W3C SHACL vocabulary
(dict-shaped, like ``operators/r2rml.py``) as declarative constraints
compiled to DataFrame plans over the engine's 6-column triple tables:

Supported (sh:) constraints per property shape:
- ``min_count`` / ``max_count``  (sh:minCount / sh:maxCount)
- ``node_kind: "IRI"`` / ``"Literal"`` (sh:nodeKind, via obj_is_uri)
- ``in``: allowed value list      (sh:in)
- ``pattern``: regex on the value (sh:pattern)
- ``datatype``: required obj_datatype (sh:datatype; null-safe)

Targets: ``target_class`` selects focus nodes by ``rdf:type`` (or the
caller's ``type_pred``). The report is a violations DataFrame
``(focus, shape, path, constraint, value)`` — empty means conformant,
mirroring ``sh:ValidationReport``.

Scale shape (100 TB lens): cardinality constraints are ONE hash
aggregate per property path over the path-filtered slice (predicate
pushdown reaches the scan; a pred-partitioned/sorted layout prunes
to the path's row groups) joined to the focus set; value constraints
are pure row-level filters joined once against the focus set — no
windows, no collects, nothing quadratic. AQE broadcasts the focus
set when the target class is small.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_REPORT_COLS = ("focus", "shape", "path", "constraint", "value")


def _violation(df, shape, path, constraint, value_col):
    return df.select(
        F.col("focus"),
        F.lit(shape).alias("shape"),
        F.lit(path).alias("path"),
        F.lit(constraint).alias("constraint"),
        value_col.cast("string").alias("value"),
    )


def shacl_report(
    triples: DataFrame,
    shapes: Sequence[dict],
    type_pred: str = RDF_TYPE,
) -> DataFrame:
    """Validate ``triples`` against ``shapes``; return the violation
    report (empty DataFrame = conforms).

    ``triples`` needs ``subj/pred/obj``; ``obj_is_uri`` is required
    only when a shape uses ``node_kind`` and ``obj_datatype`` only
    when one uses ``datatype``.
    """
    if not shapes:
        raise ValueError("no shapes given")
    t = triples
    out: Optional[DataFrame] = None

    def add(v):
        nonlocal out
        out = v if out is None else out.unionByName(v)

    for sh in shapes:
        name = sh.get("shape") or sh.get("name")
        tc = sh.get("target_class")
        if not name or not tc:
            raise ValueError(
                "shape needs 'shape' (name) and 'target_class': %r" % (sh,))
        focus = (
            t.filter((F.col("pred") == type_pred) & (F.col("obj") == tc))
            .select(F.col("subj").alias("focus")).distinct()
        )
        for prop in sh.get("property", ()):
            path = prop.get("path")
            if not path:
                raise ValueError("property shape needs 'path': %r" % (prop,))
            known = {"path", "min_count", "max_count", "node_kind",
                     "in", "pattern", "datatype"}
            unknown = set(prop) - known
            if unknown:
                raise ValueError(
                    "unsupported SHACL constraints %s in %r"
                    % (sorted(unknown), prop))

            # SHACL validates a data GRAPH — a SET of triples. The
            # engine's quad tables legitimately repeat one (s,p,o)
            # per named graph it appears in (pa/ld/ld_sujets...), so
            # counting ROWS would report maxCount violations for
            # values that are one node in the merged graph: dedup
            # the path slice on (subj + value identity) first. The
            # distinct runs on the pred-filtered slice only, never
            # the full table.
            value_cols = [c for c in ("obj", "obj_is_uri", "obj_lang",
                                      "obj_datatype") if c in t.columns]
            vals = (
                t.filter(F.col("pred") == path)
                .select("subj", *value_cols)
                .dropDuplicates(["subj"] + value_cols)
                .join(focus, F.col("subj") == focus.focus)
            )
            if "min_count" in prop or "max_count" in prop:
                counts = (
                    vals.groupBy("focus")
                    .agg(F.count(F.lit(1)).alias("n"))
                )
                if "min_count" in prop:
                    mn = int(prop["min_count"])
                    missing = (
                        focus.join(counts, on="focus", how="left")
                        .filter(F.coalesce(F.col("n"), F.lit(0)) < mn)
                    )
                    add(_violation(missing, name, path, "minCount",
                                   F.coalesce(F.col("n"), F.lit(0))))
                if "max_count" in prop:
                    mx = int(prop["max_count"])
                    over = counts.filter(F.col("n") > mx)
                    add(_violation(over, name, path, "maxCount",
                                   F.col("n")))
            if "node_kind" in prop:
                nk = prop["node_kind"]
                if nk not in ("IRI", "Literal"):
                    raise ValueError(
                        "node_kind must be 'IRI' or 'Literal': %r" % (nk,))
                want_uri = nk == "IRI"
                bad = vals.filter(F.col("obj_is_uri") != F.lit(want_uri))
                add(_violation(bad, name, path, "nodeKind", F.col("obj")))
            if "in" in prop:
                allowed = list(prop["in"])
                if not allowed:
                    raise ValueError("'in' needs a non-empty list")
                bad = vals.filter(~F.col("obj").isin(allowed))
                add(_violation(bad, name, path, "in", F.col("obj")))
            if "pattern" in prop:
                bad = vals.filter(~F.col("obj").rlike(prop["pattern"]))
                add(_violation(bad, name, path, "pattern", F.col("obj")))
            if "datatype" in prop:
                dt = prop["datatype"]
                bad = vals.filter(~F.col("obj_datatype").eqNullSafe(dt))
                add(_violation(bad, name, path, "datatype", F.col("obj")))
    if out is None:
        raise ValueError("shapes declare no property constraints")
    return out
