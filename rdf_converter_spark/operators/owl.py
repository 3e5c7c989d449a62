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


OWL_INVERSE_OF = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def owl_entail_lite(
    triples: DataFrame,
    type_pred: str = _RDF_TYPE,
    max_iter: int = 16,
) -> DataFrame:
    """Materialize the OWL-lite PROPERTY axioms on top of the rho-df
    fragment (``operators/rdfs.py`` covers class/property
    hierarchies; this covers the property-semantics trio):

    - ``p owl:inverseOf q``  -> every ``s p o`` adds ``o q s`` and
      every ``s q o`` adds ``o p s`` (both directions, per spec);
    - ``p rdf:type owl:SymmetricProperty`` -> ``s p o`` adds
      ``o p s``;
    - ``p rdf:type owl:TransitiveProperty`` -> the per-predicate
      transitive closure of ``p``'s edge set (iterative doubling,
      all transitive predicates closed TOGETHER keyed by pred —
      one loop regardless of how many predicates are declared).

    Scale shape: the axiom tables are ontology-sized and broadcast;
    inverse/symmetric derivation is a broadcast join + projection
    (the corpus never exchanges); the transitive loop runs ONLY on
    the edges of declared-transitive predicates (pushed-down
    pred IN (...) scan — at 10^12 triples the hierarchy predicates
    are a sliver; a corpus-scale transitive predicate is a
    connected-components-shaped job and should use
    ``operators/cc.py`` instead). Output = input ∪ entailments,
    deduplicated, URI-object rows only (OWL property semantics
    relate individuals; literals cannot be subjects)."""
    cols = ["subj", "pred", "obj"]
    inv = (
        triples.filter(F.col("pred") == OWL_INVERSE_OF)
        .select(F.col("subj").alias("p"), F.col("obj").alias("q"))
    )
    # both directions: inverseOf is symmetric in its own right
    inv2 = inv.unionByName(
        inv.select(F.col("q").alias("p"), F.col("p").alias("q"))
    ).distinct()
    sym = (
        triples.filter(
            (F.col("pred") == type_pred) & (F.col("obj") == OWL_SYMMETRIC))
        .select(F.col("subj").alias("p"))
        .distinct()
    )
    trans = (
        triples.filter(
            (F.col("pred") == type_pred) & (F.col("obj") == OWL_TRANSITIVE))
        .select(F.col("subj").alias("p"))
        .distinct()
    )

    uri_rows = triples.filter(F.col("obj_is_uri")).select(*cols)
    r_inv = (
        uri_rows.join(F.broadcast(inv2), uri_rows.pred == inv2.p)
        .select(
            F.col("obj").alias("subj"), F.col("q").alias("pred"),
            F.col("subj").alias("obj"),
        )
    )
    r_sym = (
        uri_rows.join(F.broadcast(sym), uri_rows.pred == sym.p)
        .select(
            F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj"),
        )
    )
    # transitive closure per declared-transitive predicate: doubling
    # over (pred, subj, obj) — inverse/symmetric derivations of the
    # SAME predicate participate (the spec's fixpoint would too), so
    # close over the union
    t_edges = (
        uri_rows.unionByName(r_inv).unionByName(r_sym)
        .join(F.broadcast(trans), F.col("pred") == trans.p)
        .select(*cols).distinct().localCheckpoint()
    )
    cur, n = t_edges, t_edges.count()
    for _ in range(max_iter):
        if n == 0:
            break
        hop = (
            cur.alias("a")
            .join(
                cur.alias("b"),
                (F.col("a.pred") == F.col("b.pred"))
                & (F.col("a.obj") == F.col("b.subj")),
            )
            .select(
                F.col("a.subj").alias("subj"), F.col("a.pred").alias("pred"),
                F.col("b.obj").alias("obj"),
            )
        )
        nxt = cur.unionByName(hop).distinct().localCheckpoint()
        m = nxt.count()
        if m == n:
            break
        cur, n = nxt, m
    else:
        raise ValueError(
            "owl_entail_lite: transitive closure did not converge in "
            "%d doubling rounds" % max_iter
        )

    derived = (
        r_inv.unionByName(r_sym).unionByName(cur.select(*cols))
        .withColumn("obj_is_uri", F.lit(True))
    )
    base = triples.select(*cols, "obj_is_uri")
    return base.unionByName(derived).dropDuplicates()
