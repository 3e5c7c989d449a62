# -*- coding: utf-8 -*-
"""Entity linking: batched mention detection + candidate scoring
against a broadcast alias dictionary (BASELINE north_star).

This generalizes the reference's pointwise alias ladder (flow fallback
keys, ld_converter.py:588-607) into a corpus-scale operator:

  1. the alias dictionary is a small (entity_id, alias, weight) table
     — full surface forms weight 1.0, degraded forms (here: 4-char
     prefixes) weight 0.5 — broadcast to every executor;
  2. mention detection is batched: documents explode into candidate
     probe keys (the token and its degraded form — the same
     candidate-key ladder as J3) and hash-join the broadcast aliases;
  3. scoring aggregates matched weights per (doc, entity) and keeps
     the top-k candidates per document (deterministic tie-break).

Everything is native Spark SQL (one explode + one broadcast join +
one aggregation + one window), reproduced in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def build_alias_dictionary(
    docs: DataFrame, n_entities: int = 30, min_len: int = 4,
    prefix_len: int = 4,
) -> DataFrame:
    """Deterministic alias dictionary from the corpus vocabulary: the
    n most frequent words (>= min_len chars; ties alphabetical) become
    entities; each contributes its full form (weight 1.0) and its
    prefix form (weight 0.5). In production this is the curated alias
    table; here it is derived so tests are self-contained."""
    vocab = (
        docs.select(F.explode(_words()).alias("w"))
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(n_entities)
        .select(
            F.col("w").alias("entity"),
            F.md5(F.col("w")).alias("entity_id"),
        )
    )
    full = vocab.select(
        "entity_id", "entity", F.col("entity").alias("alias"),
        F.lit(1.0).alias("weight"),
    )
    prefix = vocab.select(
        "entity_id", "entity",
        F.substring("entity", 1, prefix_len).alias("alias"),
        F.lit(0.5).alias("weight"),
    )
    return full.unionByName(prefix)


def entity_links(
    docs: DataFrame, aliases: DataFrame, topk: int = 3,
    prefix_len: int = 4,
) -> DataFrame:
    """Top-k scored entity candidates per document."""
    mentions = docs.select(
        "doc_id", F.explode(_words()).alias("token")
    )
    probes = mentions.select(
        "doc_id",
        F.explode(
            F.array(
                F.col("token"),
                F.substring("token", 1, prefix_len),
            )
        ).alias("probe"),
    )
    joined = probes.join(
        F.broadcast(aliases), probes.probe == aliases["alias"]
    )
    scored = joined.groupBy("doc_id", "entity_id", "entity").agg(
        F.round(F.sum("weight"), 2).alias("score"),
        F.count("*").alias("n_mentions"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("entity").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("doc_id", "entity_id", "entity", "score",
                F.col("n_mentions").cast("long").alias("n_mentions"),
                F.col("rank").cast("long").alias("rank"))
    )
