# -*- coding: utf-8 -*-
"""Controlled-vocabulary seeding (A7): fixed triple blocks emitted once
per output graph, built driver-side from the dimension dictionaries.

INA block: ld_converter.py:246-274 / pa_converter.py:251-279 (roles,
genres, themes, language/french). Yle block: yle_converter.py:215-255
(languages from three maps' values split on '/', roles en+fi, genres).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from .. import config, mappings
from ..terms import EB, RDF_TYPE, RDFS_LABEL

BASE = config.BASE

Row = Tuple[str, str, str, bool, Optional[str], Optional[str]]


def _u(s, p, o) -> Row:
    return (s, p, o, True, None, None)


def _l(s, p, o, lang=None) -> Row:
    return (s, p, o, False, lang, None)


def _ina_rows() -> List[Row]:
    rows: List[Row] = []
    for kind, loader, klass in (
        ("role", mappings.ina_code2role, "Role"),
        ("genre", mappings.ina_genres, "Genre"),
        ("theme", mappings.ina_themes, "Theme"),
    ):
        for label_fr, label_en in loader().items():
            uri = BASE + kind + "/" + label_en.lower().replace(" ", "_")
            rows.append(_u(uri, RDF_TYPE, EB(klass)))
            rows.append(_l(uri, RDFS_LABEL, label_en))
            rows.append(_l(uri, RDFS_LABEL, label_fr, "fr"))
    fr = BASE + "language/french"
    rows.append(_u(fr, RDF_TYPE, EB("Language")))
    rows.append(_l(fr, RDFS_LABEL, "French"))
    rows.append(_l(fr, RDFS_LABEL, "Français", "fr"))
    return rows


def _yle_rows() -> List[Row]:
    rows: List[Row] = []
    langs = set()
    for loader in (
        mappings.yle_episode_lang,
        mappings.yle_subtitles_lang,
        mappings.yle_audio_lang,
    ):
        for v in loader().values():
            for part in v.split("/"):
                langs.add(part.lower())
    for language in langs:
        uri = BASE + "language/" + language.lower().replace(" ", "_")
        rows.append(_u(uri, RDF_TYPE, EB("Language")))
        rows.append(_l(uri, RDFS_LABEL, language[0].upper() + language[1:]))

    roles_fi = mappings.yle_id2role()
    roles_en = mappings.yle_id2role_en()
    for code, label_fi in roles_fi.items():
        label_en = roles_en[code]
        uri = (
            BASE + "role/"
            + label_en.lower().replace(" ", "_").replace("/", "_")
        )
        rows.append(_u(uri, RDF_TYPE, EB("Role")))
        rows.append(_l(uri, RDFS_LABEL, label_en))
        rows.append(_l(uri, RDFS_LABEL, label_fi, "fi"))

    for genre_fi, genre_en in mappings.yle_class2label().items():
        uri = (
            BASE + "genre/"
            + genre_en.lower().replace(" ", "_").replace("/", "_")
        )
        rows.append(_u(uri, RDF_TYPE, EB("Genre")))
        rows.append(_l(uri, RDFS_LABEL, genre_en[0].upper() + genre_en[1:]))
        rows.append(_l(uri, RDFS_LABEL, genre_fi, "fi"))
    return rows


def _df(spark: SparkSession, rows: List[Row], graph: str) -> DataFrame:
    from ..terms import TRIPLE_SCHEMA

    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    return df.selectExpr("*", "'%s' as graph" % graph,
                         "cast(null as string) as src_url")


def ina_vocab(spark: SparkSession, graph: str) -> DataFrame:
    return _df(spark, _ina_rows(), graph)


def yle_vocab(spark: SparkSession, graph: str) -> DataFrame:
    return _df(spark, _yle_rows(), graph)
