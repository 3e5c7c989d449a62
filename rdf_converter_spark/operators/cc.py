# -*- coding: utf-8 -*-
"""Connected components over alias edges: the canonicalization merge.

The reference links aliases pointwise (flow fallback keys — R-prefixed
identifiers, MEDIA->PROG substitution, ld_converter.py:588-607); at
corpus scale transitive alias chains require a component merge. This
is the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame self-joins with a driver-side convergence loop — no Catalyst
extension needed, checkpointed per iteration to cut lineage growth.

Edges: (src, dst) string vertex ids. Output: (vertex, component) where
component is the component's minimum vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirect + self-loop-free + dedup'd edge list."""
    e = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return e.filter(F.col("src") != F.col("dst")).dropDuplicates()


def connected_components(
    edges: DataFrame, max_iterations: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """Star-contraction loop. Each iteration:

    large-star: for every neighbor pair (u, v) with v > u, link v to
                the minimum neighbor (incl. u) of u;
    small-star: symmetric step for v <= u.

    Convergence: the edge multiset stops changing (checked via count +
    sum-of-hash — cheap, order-insensitive). Hot hub vertices are
    handled by the min-aggregation being a partial (map-side combine).
    """
    def _star(e: DataFrame, large: bool) -> DataFrame:
        """One star round. Neighborhoods are taken from both edge
        directions; ``m = min(Gamma(u) + {u})`` per center u; large-star
        re-links strictly larger neighbors to m, small-star re-links
        the ``v <= u`` neighbors plus u itself."""
        nbrs = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbrs.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        joined = nbrs.join(mins, "src")
        if large:
            out = joined.filter(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
        else:
            relinked = joined.filter(F.col("dst") <= F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
            centers = mins.select(F.col("src"), F.col("m").alias("dst"))
            out = relinked.union(centers)
        return _canonical_edges(out)

    # materialize the input ONCE: the loop's convergence probe executes
    # the running plan every iteration, and without this checkpoint the
    # (possibly expensive — e.g. an LSH candidate generation) edge
    # lineage is re-run by every probe until the first in-loop
    # checkpoint (observed 121 s for a 5k-doc near-dup clustering, vs
    # ~8 s checkpointed). checkpoint_every=1 likewise keeps each
    # iteration's star work from running twice (probe + next iter).
    e = _canonical_edges(edges).localCheckpoint(eager=True)
    prev_sig = None
    for it in range(max_iterations):
        e = _star(e, large=True)
        e = _star(e, large=False)
        if (it + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=True)
        sig = e.select(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    # at the fixpoint every edge is (root, member): root = component min
    comp = (
        e.select(F.col("dst").alias("vertex"), F.col("src").alias("component"))
        .groupBy("vertex")
        .agg(F.min("component").alias("component"))
    )
    roots = comp.select("component").distinct().select(
        F.col("component").alias("vertex"), F.col("component")
    )
    # vertices appearing ONLY in self-loop edges never reach a canonical
    # edge: emit them as singleton components so every input vertex is
    # covered (matters for canonicalization totality and oracle parity)
    verts = edges.select(
        F.explode(F.array("src", "dst")).alias("vertex")
    ).dropDuplicates()
    singletons = verts.select("vertex", F.col("vertex").alias("component"))
    return (
        comp.unionByName(roots)
        .unionByName(singletons)
        .groupBy("vertex")
        .agg(F.min("component").alias("component"))
    )


def alias_edges_from_lineage(lineage: DataFrame) -> DataFrame:
    """Alias edges between URIs that share a normalized identifier —
    generalizes the flow fallback ladder (J3): strip a leading 'R',
    drop a file extension, MEDIA->PROG substitution."""
    norm = (
        F.regexp_replace(
            F.regexp_replace(
                F.split(F.col("identifier"), "\\.").getItem(0), "^R", ""
            ),
            "^MEDIA", "PROG",
        )
    )
    keyed = lineage.select(norm.alias("k"), F.col("uri"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, "k")
        .filter(F.col("a.uri") < F.col("b.uri"))
        .select(F.col("a.uri").alias("src"), F.col("b.uri").alias("dst"))
    )


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the component map (two left joins; the
    map side is the distinct-entity set — broadcastable in practice)."""
    smap = components.select(
        F.col("vertex").alias("subj"), F.col("component").alias("subj_canon")
    )
    omap = components.select(
        F.col("vertex").alias("obj"), F.col("component").alias("obj_canon")
    )
    out = (
        triples.join(smap, "subj", "left")
        .join(omap.hint("broadcast"), ["obj"], "left")
        .withColumn("subj", F.coalesce("subj_canon", "subj"))
        .withColumn(
            "obj",
            F.when(F.col("obj_is_uri"), F.coalesce("obj_canon", "obj"))
            .otherwise(F.col("obj")),
        )
        .drop("subj_canon", "obj_canon")
    )
    return out
