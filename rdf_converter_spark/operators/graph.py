# -*- coding: utf-8 -*-
"""Graph analytics over the constructed knowledge graph.

The reference stops at emitting triples (ld_converter.py /
pa_converter.py write the graph and exit); a web-scale triple factory
additionally needs graph-shaped quality signals over what it built —
degree profiles (hub-entity detection feeds the skew-handling story),
PageRank-style authority for entity ranking, and triangle counts as a
clustering-coefficient proxy for link-farm detection. All three are
expressed as DataFrame joins/aggregations so Catalyst plans them:

- ``degree_stats``: two partial aggregations + one outer merge — the
  exchanges are on the node key and map-side combine keeps them small.
- ``triangle_count``: the classic degree-orientation algorithm (every
  edge directed from its lower-(degree, id) endpoint); each wedge is
  enumerated at its LOWEST-degree vertex, so a hub of degree D costs
  O(D) not O(D^2) — the difference between a plan that survives a
  power-law web graph and one that dies on the first big hub.
- ``pagerank``: fixed-iteration power method as a driver loop of
  join+aggregate rounds, ``localCheckpoint`` per iteration to cut the
  lineage (same discipline as cc.py). Dangling-node mass follows the
  common simplification of redistributing only via the teleport term,
  identically in the DuckDB oracle.

Edges are (src, dst) strings — e.g. the URI->URI statements of a
triple table (``obj_is_uri``) or a deterministic document link graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_edges(docs: DataFrame, n_hubs: int = 10) -> DataFrame:
    """Deterministic synthetic web-link graph over the documents
    table: every doc links to its two successors (mod N) plus one of
    ``n_hubs`` hub pages (``doc_id % n_hubs``) — the hub edges give
    the power-law skew a real crawl graph has, which is exactly what
    the degree-oriented triangle counter and salted aggregations are
    for. Pure arithmetic on doc_id, so any engine reproduces it."""
    n = docs.select(F.count("*").alias("n"))
    d = docs.select("doc_id").crossJoin(F.broadcast(n))
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") + 1) % F.col("n"),
                    (F.col("doc_id") + 2) % F.col("n"),
                    F.col("doc_id") % n_hubs,
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    return edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node out/in/total degree in ONE pass over the edge list:
    each edge explodes to its two endpoint contributions (a union of
    two selects would re-execute the whole edge-building subtree per
    branch — twice the scan), then one map-side-combined exchange on
    the node key."""
    unioned = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("node"),
                    F.lit(1).alias("o"),
                    F.lit(0).alias("i"),
                ),
                F.struct(
                    F.col("dst").alias("node"),
                    F.lit(0).alias("o"),
                    F.lit(1).alias("i"),
                ),
            )
        ).alias("e")
    ).select("e.node", "e.o", "e.i")
    return unioned.groupBy("node").agg(
        F.sum("o").alias("out_degree"),
        F.sum("i").alias("in_degree"),
        (F.sum("o") + F.sum("i")).alias("degree"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count by degree orientation.

    Undirect + dedup the edges, then orient every edge from its
    lower-(degree, id) endpoint to the higher one. In the oriented
    graph each triangle appears as exactly one wedge (a->b, a->c with
    b<c in the order) closed by an oriented edge b->c, so:
    wedge self-join on the low vertex + one semi-join against the
    oriented edge set. Hubs sit on the HIGH side of their edges and
    never enumerate their neighbor pairs — O(sum min(deg)) wedges
    instead of O(sum deg^2). Returns a 1-row (n_triangles) frame."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        # consumed three times (degree pass, orientation join, closing
        # semi-join) — materialize once instead of re-running the
        # upstream scan+distinct per consumer
        .localCheckpoint(eager=True)
    )
    deg = degree_stats(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).select("node", "degree")

    with_deg = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed(
            "degree", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed(
            "degree", "db"), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=True)  # self-joined twice + closing join

    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.lo") == F.col("e2.lo")).filter(
        F.col("e1.hi") < F.col("e2.hi")
    ).select(F.col("e1.hi").alias("u"), F.col("e2.hi").alias("v"))
    # closing edge may be oriented either way between u and v
    closed = wedges.join(
        oriented.select(
            F.least("lo", "hi").alias("u"), F.greatest("lo", "hi").alias("v")
        ).dropDuplicates(),
        ["u", "v"],
        "left_semi",
    )
    return closed.agg(F.count("*").alias("n_triangles"))


def pagerank(
    edges: DataFrame, iters: int = 5, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank: rank' = (1-d)/N + d * sum over
    in-neighbors of rank/out_degree. Nodes = union of both endpoint
    sets; dangling mass is not redistributed (teleport term only),
    matching the unrolled-CTE oracle term for term. Each iteration is
    ONE shuffle (join edges->ranks on src, aggregate on dst) plus a
    broadcast-sized node frame; ranks are localCheckpointed per
    iteration so the lineage stays flat at any iteration count."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
        # re-read every iteration of the loop below
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    outd = edges.groupBy("src").agg(F.count("*").alias("out_degree"))
    # out-degree is attached to the edge ONCE, outside the loop
    contrib_edges = edges.join(outd, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contribs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_degree")).alias("flow"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("flow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def khop_neighborhood(
    edges: DataFrame, sources: DataFrame, k: int = 6
) -> DataFrame:
    """Minimum-hop distance (<= k) from a source set along out-edges —
    the neighborhood expansion that fetches an entity's k-hop context
    subgraph from the KG. Frontier BFS as a driver loop: each
    iteration joins the CURRENT frontier (not the whole visited set)
    against the edge list and anti-joins out already-visited nodes, so
    per-iteration work is O(frontier x avg-degree) and the first visit
    is by construction the minimum hop. Frontier and visited set are
    localCheckpointed per iteration (flat lineage, same discipline as
    cc.py); an empty frontier short-circuits. k bounds the join count
    — a 10^12-node graph still runs exactly <= k shuffles."""
    # the edge subtree is consumed once per hop - materialize it
    # once instead of re-running the caller's scan/shuffle k times
    edges = edges.localCheckpoint(eager=True)
    frontier = (
        sources.select("node").dropDuplicates()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    # visited = lazy union of the per-hop CHECKPOINTED frontiers: each
    # leaf is already materialized with flat lineage, so re-
    # checkpointing the whole visited set every hop (O(k * V) storage
    # traffic for an O(V) result) buys nothing
    layers = [frontier]
    for i in range(1, k + 1):
        visited_nodes = layers[0].select("node")
        for layer in layers[1:]:
            visited_nodes = visited_nodes.unionAll(layer.select("node"))
        nxt = (
            frontier.join(
                edges, frontier["node"] == edges["src"]
            )
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(visited_nodes, "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        layers.append(nxt)
        frontier = nxt
    out = layers[0]
    for layer in layers[1:]:
        out = out.unionByName(layer)
    return out


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Synchronous label propagation (community detection): labels
    start as node ids; each round every node adopts the most frequent
    label among its (undirected) neighbors, ties broken by the
    SMALLEST label — fully deterministic, unlike classic async LPA,
    so the DuckDB oracle unrolls the identical recurrence CTE by CTE.

    Per iteration: join the symmetrized edge list to current labels
    on the source endpoint (one shuffle), count (node, label) with a
    partial-aggregated groupBy, then pick argmax via ``max_by`` over
    a (cnt, -label) struct — no row_number window, so the round is
    exactly two exchanges both keyed on node. Labels are
    localCheckpointed per round (flat lineage, cc.py discipline).
    Hub nodes are the AQE skew case. Returns (node, label)."""
    und = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        labels = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
            .groupBy("node")
            .agg(F.max_by(
                "label", F.struct(F.col("cnt"), -F.col("label"))
            ).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels
