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
    # ONE corpus scan pulls every axiom row (ontology-sized by
    # contract); the three per-rule tables derive from the cached
    # slice — r4 scanned the corpus once per table. Materializing
    # also severs the shared lineage with the corpus scan, which
    # otherwise trips Catalyst's self-join attribute rewrite under
    # AQE (the tables are probed on both sides of one join tree).
    ax_raw = (
        triples.filter(
            (F.col("pred") == OWL_INVERSE_OF)
            | ((F.col("pred") == type_pred)
               & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)))
        .select(*cols).localCheckpoint()
    )
    inv = (
        ax_raw.filter(F.col("pred") == OWL_INVERSE_OF)
        .select(F.col("subj").alias("p"), F.col("obj").alias("q"))
    )
    # both directions: inverseOf is symmetric in its own right
    inv2 = inv.unionByName(
        inv.select(F.col("q").alias("p"), F.col("p").alias("q"))
    ).distinct().localCheckpoint()
    sym = (
        ax_raw.filter(
            (F.col("pred") == type_pred) & (F.col("obj") == OWL_SYMMETRIC))
        .select(F.col("subj").alias("p"))
        .distinct().localCheckpoint()
    )
    trans = (
        ax_raw.filter(
            (F.col("pred") == type_pred) & (F.col("obj") == OWL_TRANSITIVE))
        .select(F.col("subj").alias("p"))
        .distinct().localCheckpoint()
    )

    uri_rows = triples.filter(F.col("obj_is_uri")).select(*cols)
    # predicates governed by ANY axiom — the rule-relevant slice. The
    # set is CLOSED under the rules (inverseOf maps inside inv2,
    # symmetric/transitive keep the predicate), so no derivation ever
    # leaves it and the rest of the corpus never enters the loop.
    axiom_preds = (
        inv2.select("p").unionByName(sym.select("p"))
        .unionByName(trans.select("p")).distinct()
    )
    relevant = (
        uri_rows.join(
            F.broadcast(axiom_preds.withColumnRenamed("p", "pred")),
            "pred", "left_semi")
        .select(*cols)
    )

    # NAME-based join keys throughout the fixpoint: the axiom tables
    # are probed on BOTH sides of the same join tree (td ⋈ ta below),
    # and attribute-based conditions (df.pred == trans.p) break under
    # Catalyst's self-join attribute dedup — observed as a "key not
    # found" optimizer assert on small plans and as silently DROPPED
    # join compositions at sf0.1 (the doubling closure degenerated to
    # one-hop-per-round).
    inv2_r = inv2.withColumnRenamed("p", "pred")
    sym_r = sym.withColumnRenamed("p", "pred")
    trans_r = trans.withColumnRenamed("p", "pred")

    def d_inv(df):
        return df.join(F.broadcast(inv2_r), "pred").select(
            F.col("obj").alias("subj"), F.col("q").alias("pred"),
            F.col("subj").alias("obj"),
        )

    def d_sym(df):
        return df.join(F.broadcast(sym_r), "pred").select(
            F.col("obj").alias("subj"), "pred",
            F.col("subj").alias("obj"),
        )

    def t_slice(df):
        return df.join(F.broadcast(trans_r), "pred", "left_semi")

    # Semi-naive fixpoint over the three rules TOGETHER (single-pass
    # application missed axiom interactions: 'p inverseOf q' + 'q a
    # SymmetricProperty' needs the symmetric twin OF the
    # inverse-derived edge; transitive closure outputs need their
    # inverse edges). Each round applies every rule to the last
    # round's DELTA only; transitive hops join delta against the
    # accumulated closure in both orders (doubling rate), candidates
    # are anti-joined against the closure, and the loop stops when a
    # round derives nothing new — inverse/symmetric are involutions,
    # so they quiesce in 2 rounds and the tail is the transitive
    # chain doubling.
    acc = relevant.distinct().localCheckpoint()
    delta = acc
    if acc.take(1):
        for _ in range(max_iter):
            cand = d_inv(delta).unionByName(d_sym(delta))
            td, ta = t_slice(delta), t_slice(acc)
            jc = (F.col("a.pred") == F.col("b.pred")) & (
                F.col("a.obj") == F.col("b.subj"))
            sel = [
                F.col("a.subj").alias("subj"),
                F.col("a.pred").alias("pred"),
                F.col("b.obj").alias("obj"),
            ]
            cand = cand.unionByName(
                td.alias("a").join(ta.alias("b"), jc).select(*sel))
            if delta is not acc:
                cand = cand.unionByName(
                    ta.alias("a").join(td.alias("b"), jc).select(*sel))
            new = (
                cand.distinct()
                .join(acc, on=cols, how="left_anti")
                .localCheckpoint()
            )
            if not new.take(1):
                break
            # checkpoint the union too: acc is both a join input and
            # the anti-join probe of the NEXT round's candidate plan,
            # and a live union lineage there trips Catalyst's
            # self-join attribute dedup ("key not found" assert). A
            # localCheckpoint is a per-partition copy — no exchange,
            # unlike the naive loop's per-round closure distinct().
            acc = acc.unionByName(new).localCheckpoint()
            delta = new
        else:
            raise ValueError(
                "owl_entail_lite: rule fixpoint did not converge in "
                "%d semi-naive rounds" % max_iter
            )

    derived = acc.withColumn("obj_is_uri", F.lit(True))
    base = triples.select(*cols, "obj_is_uri")
    return base.unionByName(derived).dropDuplicates()
