# -*- coding: utf-8 -*-
"""HTML-to-text extraction: the byte-identical-per-url invariant.

``extract_text(doc_type, payload, filename)`` is the single definition
of "the reference-extracted text" for a web page. The fixture generator
stores its output in the ``text`` column; the engine re-derives it from
``html`` with the same function inside an Arrow UDF; a pipeline test
asserts equality per url (BASELINE input_hint invariant).

The per-kind text uses exactly the reference's field-cleaning rules:
LD program fields pass the control-char scrub (ld_converter.py:77)
then ``.strip()``/``\\r``-removal (ld_converter.py:333-336); ASR text
is the ``preprocess_content``-normalized concatenation
(pa_converter.py:612-622).
"""

from __future__ import annotations

import json

from ..textkit import ld_scrub
from .units import parse_asr_unit, parse_csv_unit, parse_yle_unit


def extract_text(doc_type: str, payload: bytes, filename: str = "") -> str:
    if doc_type == "ld_program":
        row = parse_csv_unit(payload)
        title = ld_scrub(str(row["TitreEmission"])).strip()
        summary = ld_scrub(str(row["Resume"])).strip().replace("\r", "")
        return title + "\n" + summary
    if doc_type == "ld_segment":
        row = parse_csv_unit(payload)
        title = str(row["TitreEmission"]).strip()
        lead = str(row["Chapeau"]).strip().replace("\r", "")
        return title + "\n" + lead
    if doc_type == "pa":
        row = parse_csv_unit(payload)
        title = str(row["Titre propre"]).strip()
        summary = str(row["Résumé"]).strip().replace("\r", "")
        return title + "\n" + summary
    if doc_type == "yle":
        fields = parse_yle_unit(payload)
        return (fields["fi_title"] or "") + "\n" + (fields["description"] or "")
    if doc_type == "asr":
        rows = parse_asr_unit(payload, filename)
        return "\n".join(r["content"] for r in rows)
    if doc_type == "flow":
        return json.loads(payload.decode("utf-8"))["name"]
    raise ValueError("unknown doc_type " + doc_type)
