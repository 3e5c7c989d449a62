# -*- coding: utf-8 -*-
"""Raw reference-layout ingestion: the directory trees the reference
converters consume (``-p data/ld``, ``-p data/pa``, ``-s asr/``,
``-f file_flow_mapping.json`` — ld_converter.py:25-28,
pa_converter.py:25-29, yle_converter.py:24-27) -> ``web_pages``
envelope rows, so a reference user can point the engine at their
existing data with no conversion step.

Layout (mirrors the reference's expectations):
    ld/<dataset>/programs.csv     latin-1, ';'-separated (S1)
    ld/<dataset>/sujets.csv
    pa/<dataset>/notices.csv
    yle/<dataset>/<stem>.xml      one MAObject document per file
    asr/<name>.xml                Vocapia ASR XML
    file_flow_mapping.json        JSON array of {name, flowHRef}

Ingestion is distributed: ``spark.read.format("binaryFile")`` lists
and reads the raw files cluster-side; one Arrow-batched mapInPandas
pass splits CSV files into per-row envelope pages (the unit the
routing stage and parse kernels consume). At corpus scale this is the
one full pass over the raw bytes.
"""

from __future__ import annotations

import csv
import io
import json
import os
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .web_pages import WEB_PAGES_SCHEMA, page_url, wrap_html

_KIND_LANG = {"ld_program": "fr", "ld_segment": "fr", "pa": "fr",
              "asr": "fr", "yle": "fi", "flow": "fr"}


def _csv_pages(kind: str, dataset: str, fname: str, data: bytes) -> List[dict]:
    """Split one reference CSV (latin-1, ';') into per-row pages, each
    carrying the header line for schema context — the same unit shape
    the fixture generator produces and parse_csv_unit consumes."""
    text = data.decode("latin-1")
    rows = list(csv.reader(io.StringIO(text), delimiter=";"))
    if not rows:
        return []
    header, body = rows[0], rows[1:]
    pages = []
    for i, row in enumerate(body):
        buf = io.StringIO()
        w = csv.writer(buf, delimiter=";", lineterminator="\n")
        w.writerow(header)
        w.writerow(row)
        pages.append(_page(kind, dataset, fname, i,
                           buf.getvalue().encode("latin-1")))
    return pages


def _page(kind: str, dataset: str, fname: str, row: int,
          payload: bytes) -> dict:
    return {
        "url": page_url(kind, dataset, fname, row),
        "warc_ts": None,
        "html": wrap_html(kind, dataset, fname, row, payload),
        "text": None,
        "lang": _KIND_LANG[kind],
    }


def _file_pages(path: str, data: bytes) -> List[dict]:
    """Dispatch one raw file to its page builder by layout position."""
    parts = path.replace("\\", "/").split("/")
    fname = parts[-1]
    if fname == "file_flow_mapping.json":
        entries = json.loads(data.decode("utf-8"))
        return [
            _page("flow", "", fname, n,
                  json.dumps(obj, ensure_ascii=False).encode("utf-8"))
            for n, obj in enumerate(entries)
        ]
    kind_dir = None
    for k in ("ld", "pa", "yle", "asr"):
        if k in parts[:-1]:
            kind_dir = k
            idx = len(parts) - 1 - parts[::-1].index(k)
            break
    if kind_dir is None:
        return []
    dataset = parts[idx + 1] if len(parts) - idx > 2 else ""
    if kind_dir == "ld" and fname.endswith(".csv"):
        kind = "ld_segment" if fname.startswith("sujets") else "ld_program"
        return _csv_pages(kind, dataset, fname, data)
    if kind_dir == "pa" and fname.endswith(".csv"):
        return _csv_pages("pa", dataset, fname, data)
    if kind_dir == "yle" and fname.endswith(".xml"):
        return [_page("yle", dataset, fname, 0, data)]
    if kind_dir == "asr" and fname.endswith(".xml"):
        return [_page("asr", "", fname, 0, data)]
    return []


def ingest_reference_layout(
    spark: SparkSession,
    ld: Optional[str] = None,
    pa: Optional[str] = None,
    yle: Optional[str] = None,
    asr: Optional[str] = None,
    flow: Optional[str] = None,
) -> DataFrame:
    """Read raw reference-layout trees into a ``web_pages`` frame."""
    paths = [p for p in (ld, pa, yle, asr, flow) if p]
    if not paths:
        raise ValueError("no input paths")
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(paths)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rel = path[len("file:"):] if path.startswith("file:") else path
                out.extend(_file_pages(rel, bytes(content)))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, WEB_PAGES_SCHEMA)
