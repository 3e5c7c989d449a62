# -*- coding: utf-8 -*-
"""Flow-file entity linking (J3): filename -> program URI with
fallback candidate keys — the reference's alias-resolution primitive.

LD (ld_converter.py:577-607): identifier = stem minus leading 'R';
probe lineage[identifier] then lineage['R'+identifier]; silent skip.
PA (pa_converter.py:555-586): same key ladder against the PA lineage.
Yle (yle_converter.py:557-608): probe '<stem>.xml' then the
MEDIA->PROG substitution — but the triple emission is guarded by
membership of the *unsubstituted* filename in the scanned file list,
so MEDIA->PROG matches never emit triples [Q].

Spark expression: two left joins on the candidate keys + coalesce
with primary-key priority; first-match per key via row_number (A4).
All dimension sides are lineage tables — small next to the corpus, so
AQE broadcast-joins them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..operators.emit import gate, triple, uref
from ..terms import EB

BASE = config.BASE


def parse_flow(routed: DataFrame) -> DataFrame:
    """flow payload rows -> (name, flow_href)."""
    src = routed.filter(F.col("doc_type") == "flow")
    payload = F.col("payload").cast("string")
    return src.select(
        "url", "row",
        F.get_json_object(payload, "$.name").alias("name"),
        F.get_json_object(payload, "$.flowHRef").alias("flow_href"),
    )


def _first_by_key(lineage: DataFrame, order_cols) -> DataFrame:
    w = Window.partitionBy("identifier").orderBy(*order_cols)
    return (
        lineage.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("identifier", "uri")
    )


def _fallback_join(flow: DataFrame, lineage_first: DataFrame) -> DataFrame:
    """identifier then 'R'+identifier (coalesce priority)."""
    j1 = lineage_first.select(
        F.col("identifier").alias("k1"), F.col("uri").alias("uri1")
    )
    j2 = lineage_first.select(
        F.col("identifier").alias("k2"), F.col("uri").alias("uri2")
    )
    out = (
        flow.join(j1, flow.identifier == j1.k1, "left")
        .join(j2, F.concat(F.lit("R"), flow.identifier) == j2.k2, "left")
        .withColumn("uri", F.coalesce("uri1", "uri2"))
        .drop("k1", "k2", "uri1", "uri2")
    )
    return out.filter(F.col("uri").isNotNull())


def _media_triples(matched: DataFrame, graph: str) -> DataFrame:
    media = F.concat(
        F.lit(BASE + "media/"), F.element_at(F.split(F.col("uri"), "/"), -1)
    )
    bundle = F.array(
        uref(media, EB("locator"), F.col("flow_href")),
        triple(media, EB("filename"), F.col("name")),
    )
    out = matched.select(F.explode(bundle).alias("t"), F.col("url"))
    flat = out.select(
        "t.subj", "t.pred", "t.obj", "t.obj_is_uri", "t.obj_lang",
        "t.obj_datatype", F.lit(graph).alias("graph"),
        F.col("url").alias("src_url"),
    )
    return gate(flat)


def ld_flow_triples(flow: DataFrame, ld_lineage: DataFrame) -> DataFrame:
    stem = F.split(F.col("name"), "\\.").getItem(0)
    f = flow.withColumn(
        "identifier",
        F.when(F.col("name").startswith("R"), F.expr("substring(split(name, '\\\\.')[0], 2)"))
        .otherwise(stem),
    )
    first = _first_by_key(ld_lineage, ["dataset", "file", "row"])
    return _media_triples(_fallback_join(f, first), "ld_flow")


def pa_flow_triples(flow: DataFrame, pa_lineage: DataFrame) -> DataFrame:
    stem = F.split(F.col("name"), "\\.").getItem(0)
    f = flow.withColumn(
        "identifier",
        F.when(stem.startswith("R"), F.expr("substring(split(name, '\\\\.')[0], 2)"))
        .otherwise(stem),
    )
    first = _first_by_key(pa_lineage, ["dataset", "file", "row"])
    return _media_triples(_fallback_join(f, first), "pa_flow")


def yle_flow_triples(flow: DataFrame, yle_lineage: DataFrame) -> DataFrame:
    """Only direct '<stem>.xml' matches emit triples; names without an
    extension are skipped; MEDIA->PROG fallback matches emit nothing
    [Q] (yle_converter.py:578-608)."""
    f = flow.filter(F.col("name").contains(".")).withColumn(
        "identifier",
        F.concat(F.split(F.col("name"), "\\.").getItem(0), F.lit(".xml")),
    )
    first = _first_by_key(yle_lineage, ["dataset", "row"])
    matched = f.join(first, f.identifier == first.identifier, "left").filter(
        first.uri.isNotNull()
    ).select(f["*"], first.uri.alias("uri"))
    return _media_triples(matched, "yle_flow")
