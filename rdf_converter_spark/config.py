"""Engine configuration: namespaces, mapping-dictionary location.

The controlled-vocabulary dictionaries (channel codes, role labels,
genre/theme translations, language names) are *data* inputs, not code:
the engine loads them at runtime from ``MEMAD_MAPPINGS_DIR`` (falling
back to a local ``mappings/`` dir, then the read-only reference copy).
"""

from __future__ import annotations

import os

BASE = "http://data.memad.eu/"
MEMAD = "http://data.memad.eu/ontology#"
EBUCORE = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#"
EBU_VIDEO_CS = "http://www.ebu.ch/metadata/ontologies/skos/ebu_VideoCompressionCodeCS#"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
SKOS_NS = "http://www.w3.org/2004/02/skos/core#"
DCTERMS_NS = "http://purl.org/dc/terms/"


def mappings_dir() -> str:
    """Resolve a filesystem directory holding the 15 vocabulary JSON
    files. The dictionaries are VENDORED as package data
    (``rdf_converter_spark/mappings_data/`` — public controlled-
    vocabulary JSONs from the reference project, loaded zip-safely by
    ``mappings.load``); this path accessor exists for tools that need
    a real directory and honors the ``MEMAD_MAPPINGS_DIR`` override."""
    for cand in (
        os.environ.get("MEMAD_MAPPINGS_DIR"),
        os.path.join(os.path.dirname(__file__), "mappings_data"),
    ):
        if cand and os.path.isdir(cand):
            return cand
    raise FileNotFoundError(
        "No mappings directory found; set MEMAD_MAPPINGS_DIR"
    )
