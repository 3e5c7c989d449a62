# -*- coding: utf-8 -*-
"""owl:sameAs smushing — merge co-referent resources in a triple table.

The reference links INA/Yle records describing the same broadcast
through its lineage identifier ladder (``flow_mapping.py``'s
fallback keys; generalized in ``operators/cc.py``); published KGs
state the same fact explicitly as ``owl:sameAs`` triples. This module
closes those assertions and rewrites the graph onto one canonical
URI per identity cluster — "smushing" in RDF folklore — entirely
with the engine's existing primitives:

1. the sameAs selection (tiny next to the corpus: identity links are
   per-entity, not per-triple) becomes an undirected edge set;
2. :func:`operators.cc.connected_components` closes it (star
   contraction — sameAs chains A=B=C merge transitively, the whole
   point of closing rather than pairwise rewriting);
3. :func:`operators.cc.canonicalize_triples` rewrites subj and URI
   objects through the vertex->component map (two joins, map side
   broadcastable).

Scale shape (100 TB lens): the corpus-sized triple table is touched
exactly twice — once filtered down to the sameAs predicate (predicate
pushdown to the scan; a pred-partitioned layout prunes to one
partition) and once for the rewrite joins. The CC loop runs only on
the identity edges. Self-loop sameAs triples (canonical -> canonical
after rewrite) are dropped; cross-cluster sameAs links collapse to
nothing, which is exactly the fixpoint property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import canonicalize_triples, connected_components

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_components(
    triples: DataFrame, sameas_pred: str = OWL_SAMEAS
) -> DataFrame:
    """Close the sameAs assertions into identity clusters: returns
    ``(vertex, component)`` with ``component`` = the lexicographic
    minimum URI of the cluster (deterministic canonical pick)."""
    edges = (
        triples.filter(
            (F.col("pred") == sameas_pred) & F.col("obj_is_uri"))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    return connected_components(edges)


def sameas_smush(
    triples: DataFrame,
    sameas_pred: str = OWL_SAMEAS,
    keep_sameas: bool = False,
) -> DataFrame:
    """Rewrite ``triples`` onto canonical URIs per sameAs cluster.

    Every subject and every URI object belonging to a cluster is
    replaced by the cluster's canonical (minimum) URI; the result is
    deduplicated (distinct facts about merged entities collapse).
    The sameAs triples themselves are dropped unless
    ``keep_sameas=True``, in which case they survive *rewritten* —
    i.e. only as intra-cluster ``canon sameAs canon`` self-loops
    which the dedup then reduces to one reflexive row per cluster."""
    comps = sameas_components(triples, sameas_pred)
    src = triples if keep_sameas else triples.filter(
        F.col("pred") != sameas_pred)
    return canonicalize_triples(src, comps).dropDuplicates()
