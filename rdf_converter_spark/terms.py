# -*- coding: utf-8 -*-
"""Triple data model: the engine's single output abstraction.

The reference holds triples in an in-memory rdflib graph with set
semantics (ld_converter.py:90,106-111); here the graph is a DataFrame
with one row per (subj, pred, obj) and typed-literal metadata columns,
deduplicated on the full 6-tuple (A1) and materialized as a partitioned
table. ``graph`` tags the logical output graph (the reference writes
one TTL per stage); ``src_url`` carries row-level lineage.
"""

from __future__ import annotations

from pyspark.sql import types as T

from . import config

TRIPLE_KEY = ["subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_datatype"]

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), True),
        T.StructField("obj_is_uri", T.BooleanType(), False),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("obj_datatype", T.StringType(), True),
    ]
)


def EB(term: str) -> str:
    return config.EBUCORE + term


def MEMAD(term: str) -> str:
    return config.MEMAD + term


def XSD(term: str) -> str:
    return config.XSD_NS + term


RDF_TYPE = config.RDF_NS + "type"
RDFS_LABEL = config.RDFS_NS + "label"
SKOS_NOTE = config.SKOS_NS + "note"
DCT_PUBLISHER = config.DCTERMS_NS + "publisher"
