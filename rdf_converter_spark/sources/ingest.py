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


def _file_pages(tree: str, root: str, path: str, data: bytes) -> List[dict]:
    """Dispatch one raw file to its page builder. ``tree`` names WHICH
    input argument the file came from (ld/pa/yle/asr/flow) — never
    guessed from directory names, so ``-p /data/legal_deposit`` works.
    ``dataset`` is the first path component under the given root."""
    rel = path.replace("\\", "/")
    root = root.replace("\\", "/").rstrip("/")
    if rel.startswith(root):
        rel = rel[len(root):].lstrip("/")
    if not rel:  # the tree argument pointed at this very file
        rel = root.rsplit("/", 1)[-1]
    comps = rel.split("/")
    fname = comps[-1]
    dataset = comps[0] if len(comps) > 1 else ""
    if tree == "flow":
        if not fname.endswith(".json"):
            return []
        entries = json.loads(data.decode("utf-8"))
        return [
            _page("flow", "", fname, n,
                  json.dumps(obj, ensure_ascii=False).encode("utf-8"))
            for n, obj in enumerate(entries)
        ]
    if tree == "ld" and fname.endswith(".csv"):
        kind = "ld_segment" if fname.startswith("sujets") else "ld_program"
        return _csv_pages(kind, dataset, fname, data)
    if tree == "pa" and fname.endswith(".csv"):
        return _csv_pages("pa", dataset, fname, data)
    if tree == "yle" and fname.endswith(".xml"):
        return [_page("yle", dataset, fname, 0, data)]
    if tree == "asr" and fname.endswith(".xml"):
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
    from pyspark.sql import functions as F

    trees = [(t, p) for t, p in
             (("ld", ld), ("pa", pa), ("yle", yle), ("asr", asr),
              ("flow", flow)) if p]
    if not trees:
        raise ValueError("no input paths")
    # binaryFile yields absolute file: URIs; normalize roots to match
    roots = {t: os.path.abspath(p) for t, p in trees}
    frames = []
    for tree, path in trees:
        frames.append(
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .load(path)
            .select(F.lit(tree).alias("tree"), "path", "content")
        )
    files = frames[0]
    for f in frames[1:]:
        files = files.unionByName(f)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            out = []
            for tree, path, content in zip(
                pdf["tree"], pdf["path"], pdf["content"]
            ):
                rel = path[len("file:"):] if path.startswith("file:") else path
                out.extend(
                    _file_pages(tree, roots[tree], rel, bytes(content))
                )
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, WEB_PAGES_SCHEMA)
