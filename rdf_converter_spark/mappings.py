"""Loaders for the controlled-vocabulary dimension dictionaries.

The reference re-reads each JSON file on every ``transform`` call
(``ld_converter.py:126-136``); here each dictionary is loaded once per
process and captured in UDF closures (driver-side load -> shipped with
the serialized closure, i.e. a broadcast dimension).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from . import config


@lru_cache(maxsize=None)
def load(name: str) -> dict:
    """VENDORED package data (``rdf_converter_spark/mappings_data/``,
    public controlled-vocabulary JSONs from the reference project's
    ``mappings/``) read via importlib.resources so it also resolves
    from inside a ``--py-files`` zip on the executors;
    ``MEMAD_MAPPINGS_DIR`` overrides for operators shipping updated
    vocabularies."""
    override = os.environ.get("MEMAD_MAPPINGS_DIR")
    if override:
        path = os.path.join(override, name + ".json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                return json.load(fh)
    from importlib.resources import files

    res = files(config.__package__).joinpath(
        "mappings_data/%s.json" % name
    )
    return json.loads(res.read_text(encoding="utf-8"))


def ina_channel2code() -> dict:
    return load("ina_channel2code")


def ina_code2role() -> dict:
    return load("ina_code2role")


def ina_genres() -> dict:
    return load("ina_genres")


def ina_themes() -> dict:
    return load("ina_themes")


def yle_channel2code() -> dict:
    return load("yle_channel2code")


def yle_class2label() -> dict:
    return load("yle_class2label")


def yle_episode_lang() -> dict:
    return load("yle_episode_lang")


def yle_subtitles_lang() -> dict:
    return load("yle_subtitles_lang")


def yle_audio_lang() -> dict:
    return load("yle_audio_lang")


def yle_id2role() -> dict:
    return load("yle_id2role")


def yle_id2role_en() -> dict:
    return load("yle_id2role_en")


def yle_aspect_ratio() -> dict:
    return load("yle_aspect_ratio")
