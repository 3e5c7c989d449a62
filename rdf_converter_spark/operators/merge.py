# -*- coding: utf-8 -*-
"""Incremental triple-table maintenance: SCD-style upsert merge.

The reference converter is batch-only — every run re-emits the whole
graph (ld_converter.py writes one Turtle file per invocation). A
resumable 10^12-document factory instead maintains a base triple
table and merges per-batch deltas into it. Semantics here are the
standard property-replacement upsert used by RDF stores' named-graph
PUT: a delta batch REPLACES all base objects for every (subj, pred)
pair it mentions (multi-valued predicates replace as a group), and
appends pairs the base has never seen. Deletes ride the same path as
an empty group via explicit tombstones (obj IS NULL rows).

Plan shape: one left-anti join of base against the delta's distinct
key pairs + a union — both exchanges hash on (subj, pred), which is
the natural bucketing key for a stored triple table, so with the base
bucketed by (subj, pred) the anti join is shuffle-free on the big
side and only the (small) delta moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["subj", "pred"]


def upsert_triples(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a delta batch into a base triple table.

    Rows in ``delta`` with a NULL ``obj`` are tombstones: they delete
    the whole (subj, pred) group from the base and contribute no rows
    themselves. All frames carry at least (subj, pred, obj); any
    extra columns (lang/datatype/graph) ride along from whichever
    side survives."""
    keys = delta.select(*KEY).dropDuplicates()
    kept = base.join(keys, KEY, "left_anti")
    live = delta.filter(F.col("obj").isNotNull())
    return kept.unionByName(live).dropDuplicates()
