# -*- coding: utf-8 -*-
"""Corpus curation operators a training-data pipeline needs between
dedup and export: deterministic split assignment, language-balanced
subsampling, and benchmark decontamination.

All three are pure Spark SQL expressions/joins (no UDFs, no RNG
state): determinism is the point — a document's split/sample fate is
a content-keyed hash, reproducible across reruns, engines (DuckDB
oracle twins in `__spark_entry__`) and corpus growth, which
`rand()`-based sampling cannot provide. Not present in the reference
(it converts a fixed archive); cited as the §2.11 extension surface.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(col, salt: str):
    """int(md5(key|salt)[:8], 16) — the engine-portable uniform hash
    used across the dedup/minhash family."""
    return F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit("|" + salt))), 1, 8
        ),
        16, 10,
    ).cast("long")


def deterministic_split(
    df: DataFrame,
    key: str = "doc_id",
    splits: Sequence[Tuple[str, float]] = (
        ("train", 0.90), ("val", 0.05), ("test", 0.05),
    ),
    salt: str = "v1",
    buckets: int = 10000,
) -> DataFrame:
    """Content-stable train/val/test assignment: bucket =
    hash(key|salt) % buckets, mapped through cumulative integer
    thresholds. A row's split never depends on any other row, so
    growing the corpus or re-running the job never migrates a document
    across the eval boundary (the leakage mode of fraction-based
    `randomSplit`). Changing ``salt`` re-draws the whole assignment.
    """
    fracs = [f for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    b = _hash_key(F.col(key), salt) % buckets
    cum, expr = 0.0, None
    for name, frac in splits[:-1]:
        cum += frac
        cond = b < int(round(cum * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def lang_quota_sample(
    df: DataFrame,
    quota: int = 50,
    lang_col: str = "lang",
    key: str = "doc_id",
    salt: str = "v1",
) -> DataFrame:
    """Language-balanced subsample: deterministic hash order within
    each language, keep the first ``quota`` rows — the data-mixing
    primitive that rebalances a crawl's language skew (a head language
    with 100x the documents still contributes exactly ``quota``).
    One exchange (the per-language window); ties broken by key so the
    result is total-order stable."""
    w = Window.partitionBy(lang_col).orderBy(
        F.md5(F.concat(F.col(key).cast("string"), F.lit("|" + salt))),
        F.col(key),
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def _gram_hashes(df: DataFrame, id_col: str, n: int, text_col: str):
    """Distinct word-``n``-gram hashes per document. Documents with
    FEWER than ``n`` words emit no grams at all (ADVICE r03: the old
    ``greatest(size-n, 0)`` emitted one short-gram per such doc, so
    an empty/short benchmark doc flagged every equally-short training
    doc as contaminated — systematic false positives the oracle's
    identical bug masked; the oracle SQL carries the same filter)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    grams = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, n)))
    )
    return df.filter(F.size(words) >= n).select(
        F.col(id_col),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    shares at least one word ``n``-gram with an evaluation set (the
    standard pre-training hygiene pass). The benchmark side is tiny by
    construction, so its distinct gram hashes are BROADCAST into an
    equi-join against the exploded corpus grams — the corpus is
    touched once, never shuffled. Returns one row per input doc:
    (doc_id, n_hits = count of distinct contaminated grams,
    contaminated = n_hits > 0)."""
    bench = _gram_hashes(benchmark, "doc_id", n, text_col).select(
        "gram"
    ).dropDuplicates()
    corpus = _gram_hashes(docs, "doc_id", n, text_col)
    hits = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def mixture_sample(
    df: DataFrame,
    weights: dict,
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix1",
    buckets: int = 10000,
) -> DataFrame:
    """Dataset mixing: keep each group at its sampling weight (the
    per-source mixture a pretraining run specifies — wiki 3x-epoch'd,
    crawl downsampled). Same content-stable hash-bucket rule as
    deterministic_split: a row's fate depends only on its own key, so
    the mixture is reproducible, growth-stable, and never reshuffles
    the corpus (pure filter — no exchange at all). Groups missing
    from ``weights`` default to weight 0 (dropped): an explicit
    mixture spec is a whitelist. Weights are in [0, 1]; epoch
    multipliers > 1 belong to the loader, not the filter."""
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError("weight out of [0,1] for %r: %r" % (g, w))
        if w > 0 and int(round(w * buckets)) == 0:
            raise ValueError(
                "weight %r for %r rounds to a zero threshold at "
                "buckets=%d - raise buckets or the weight; silently "
                "dropping a deliberately-included source is worse "
                "than failing" % (w, g, buckets)
            )
    b = _hash_key(F.col(key), salt) % buckets
    thresh = F.lit(0)
    for g, w in sorted(weights.items()):
        thresh = F.when(
            F.col(group_col) == g, F.lit(int(round(w * buckets)))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def sequence_pack(
    docs: DataFrame,
    capacity: int = 2048,
    token_col=None,
) -> DataFrame:
    """Sequential sequence packing: concatenate documents in doc_id
    order into fixed-capacity context windows (the pretraining packing
    that turns ragged documents into full training sequences;
    documents straddle bin boundaries exactly as a naive concat-and-
    chunk tokenizer pipeline does). bin = exclusive-prefix-sum of
    token counts DIV capacity, offset = the remainder — ONE window
    exchange, deterministic in every engine.

    At 10^12 docs a single global ordering is a one-reducer sort, so
    packing is per (lang, split-bucket) in practice; the global
    variant here keeps the oracle simple while the partitioned window
    is the identical expression over more keys."""
    from pyspark.sql import Window

    if isinstance(token_col, str):
        token_col = F.col(token_col)
    # whitespace-only text splits to [''] (size 1); count it as the 0
    # tokens it is — same guard as line_dedup
    tokens = token_col if token_col is not None else F.when(
        F.trim(F.col("text")) == "", F.lit(0)
    ).otherwise(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_excl = F.coalesce(
        F.sum(tokens).over(w), F.lit(0).cast("long")
    )
    # integer DIV, never float '/': a 10^12-doc corpus accumulates
    # > 2^53 tokens and double division silently mis-bins past that
    return docs.select(
        "doc_id",
        tokens.cast("long").alias("n_tokens"),
        cum_excl.alias("_cum"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("_cum DIV %d" % capacity).alias("bin"),
        (F.col("_cum") % capacity).cast("long").alias("offset"),
    )
