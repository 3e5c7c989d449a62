# -*- coding: utf-8 -*-
"""Distributed N-Triples source.

The engine writes N-Triples at scale (``operators/export.py:
to_turtle_distributed``); this is the matching READER, closing the
loop so RDF produced by this engine — or any standards-compliant
tool, e.g. the reference's rdflib ``serialize(format='nt')`` — can be
re-ingested as a 6-column triple table. N-Triples is the one RDF
syntax that is line-oriented, which makes it the natural Spark input
format: ``spark.read.text`` splits on newlines, so a 100 TB dump
parallelizes like any text corpus (Turtle/JSON-LD are document-scoped
and would need whole-file reads; convert those with a streaming tool
first).

Parsing strategy (same split as the CSV/XML kernels in
``sources/units.py``: structure JVM-side, irreducible per-value work
in Arrow kernels):
- line recognition + term extraction is ONE ``regexp_extract_all``
  -free pass of anchored ``regexp_extract`` calls — pure JVM,
  whole-stage-codegen'd;
- literal unescaping is JVM ``regexp_replace`` only for lines with NO
  backslash (the overwhelmingly common case: clean literals pass
  through untouched); lines containing an escape go through a
  vectorized Arrow kernel implementing the full N-Triples ECHAR +
  UCHAR set (``\\t \\b \\n \\r \\f \\" \\' \\\\ \\uXXXX
  \\UXXXXXXXX``) — a sequential ``regexp_replace`` chain CANNOT
  decode escapes correctly (``\\\\n`` = backslash+n would be eaten
  twice), it must be a single left-to-right scan.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# <s> <p> (object-part) .   — object classified separately
_LINE = r'^\s*<([^>]*)>\s*<([^>]*)>\s*(.*?)\s*\.\s*$'
_URI_OBJ = r'^<([^>]*)>$'
_LIT_OBJ = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$'

_ECHAR = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.DOTALL)


def unescape_literal(s: str) -> str:
    """Single-pass N-Triples string unescape (ECHAR + UCHAR)."""
    def sub(m):
        u4, u8, ch = m.groups()
        if u4 is not None:
            return chr(int(u4, 16))
        if u8 is not None:
            return chr(int(u8, 16))
        if ch in _ECHAR:
            return _ECHAR[ch]
        raise ValueError("invalid N-Triples escape '\\%s'" % ch)
    return _ESCAPE_RE.sub(sub, s)


@F.pandas_udf(T.StringType())
def _unescape_udf(vals: pd.Series) -> pd.Series:
    return vals.map(lambda v: None if v is None else unescape_literal(v))


def parse_ntriples(
    lines: DataFrame, column: str = "value", on_error: str = "raise"
) -> DataFrame:
    """Parse a DataFrame of N-Triples lines into the engine's
    6-column triple table. Blank lines and ``#`` comments are
    skipped. ``on_error='raise'`` fails the job on the first
    malformed statement (with the offending line in the message);
    ``'drop'`` discards malformed lines — crawl-grade leniency.
    """
    if on_error not in ("raise", "drop"):
        raise ValueError("on_error must be 'raise' or 'drop'")
    src = F.col(column)
    content = lines.filter(
        (F.trim(src) != "") & ~F.trim(src).startswith("#"))
    parts = content.select(
        src.alias("_line"),
        F.regexp_extract(src, _LINE, 1).alias("subj"),
        F.regexp_extract(src, _LINE, 2).alias("pred"),
        F.regexp_extract(src, _LINE, 3).alias("_obj"),
    )
    # regexp_extract returns '' on no-match; a matched line always
    # has non-empty subj/pred (<> IRIs are non-empty in practice but
    # '' subjects would also fail _LINE's obj anchor round-trip, so
    # the malformed gate keys on the OBJECT classification below)
    is_uri = F.col("_obj").rlike(_URI_OBJ)
    is_lit = F.col("_obj").rlike(_LIT_OBJ)
    raw_lit = F.regexp_extract(F.col("_obj"), _LIT_OBJ, 1)
    lit = F.when(
        raw_lit.contains("\\"), _unescape_udf(raw_lit)
    ).otherwise(raw_lit)
    parsed = parts.select(
        "_line",
        (F.col("_line").rlike(_LINE) & (is_uri | is_lit)).alias("_ok"),
        F.col("subj"),
        F.col("pred"),
        F.when(is_uri, F.regexp_extract(F.col("_obj"), _URI_OBJ, 1))
        .otherwise(lit).alias("obj"),
        is_uri.alias("obj_is_uri"),
        F.nullif(F.regexp_extract(F.col("_obj"), _LIT_OBJ, 2), F.lit(""))
        .alias("obj_lang"),
        F.nullif(F.regexp_extract(F.col("_obj"), _LIT_OBJ, 3), F.lit(""))
        .alias("obj_datatype"),
    )
    if on_error == "raise":
        # assert_true returns NULL on success and raises otherwise;
        # putting it in the FILTER condition makes it unprunable (a
        # dropped check column would be optimized away unevaluated)
        guarded = parsed.filter(F.assert_true(
            F.col("_ok"),
            F.concat(F.lit("malformed N-Triples line: "), F.col("_line")),
        ).isNull())
    else:
        guarded = parsed.filter(F.col("_ok"))
    return guarded.drop("_line", "_ok")


def read_ntriples(
    spark: SparkSession, path: str, on_error: str = "raise"
) -> DataFrame:
    """``spark.read.text`` + ``parse_ntriples`` — each 128 MB text
    split parses independently."""
    return parse_ntriples(spark.read.text(path), on_error=on_error)


# N-Quads: the object is matched STRUCTURALLY (a complete IRI or
# literal term) so the optional trailing graph IRI is unambiguous —
# a lazy free-form object group could otherwise donate '<o>' of a
# graphless line to the graph slot, or split a literal containing
# ' <x>' at the wrong quote.
_NQ_LINE = (
    r'^\s*<([^>]*)>\s*<([^>]*)>\s*'
    r'(<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)'
    r'(?:\s+<([^>]*)>)?\s*\.\s*$'
)


def parse_nquads(
    lines: DataFrame, column: str = "value", on_error: str = "raise"
) -> DataFrame:
    """Parse N-Quads lines into the 6-column triple table plus a
    ``graph`` column (NULL = default graph, i.e. a plain N-Triples
    line — N-Quads is a strict superset, so this reader subsumes
    ``parse_ntriples`` for mixed dumps). Same split as the NT reader:
    structure and clean literals stay JVM-side; only literals that
    actually contain an escape cross into the Arrow unescape kernel.
    """
    if on_error not in ("raise", "drop"):
        raise ValueError("on_error must be 'raise' or 'drop'")
    src = F.col(column)
    content = lines.filter(
        (F.trim(src) != "") & ~F.trim(src).startswith("#"))
    parts = content.select(
        src.alias("_line"),
        src.rlike(_NQ_LINE).alias("_ok"),
        F.regexp_extract(src, _NQ_LINE, 1).alias("subj"),
        F.regexp_extract(src, _NQ_LINE, 2).alias("pred"),
        F.regexp_extract(src, _NQ_LINE, 3).alias("_obj"),
        F.nullif(F.regexp_extract(src, _NQ_LINE, 4), F.lit(""))
        .alias("graph"),
    )
    is_uri = F.col("_obj").rlike(_URI_OBJ)
    raw_lit = F.regexp_extract(F.col("_obj"), _LIT_OBJ, 1)
    lit = F.when(
        raw_lit.contains("\\"), _unescape_udf(raw_lit)
    ).otherwise(raw_lit)
    parsed = parts.select(
        "_line",
        "_ok",
        "subj",
        "pred",
        F.when(is_uri, F.regexp_extract(F.col("_obj"), _URI_OBJ, 1))
        .otherwise(lit).alias("obj"),
        is_uri.alias("obj_is_uri"),
        F.nullif(F.regexp_extract(F.col("_obj"), _LIT_OBJ, 2), F.lit(""))
        .alias("obj_lang"),
        F.nullif(F.regexp_extract(F.col("_obj"), _LIT_OBJ, 3), F.lit(""))
        .alias("obj_datatype"),
        "graph",
    )
    if on_error == "raise":
        guarded = parsed.filter(F.assert_true(
            F.col("_ok"),
            F.concat(F.lit("malformed N-Quads line: "), F.col("_line")),
        ).isNull())
    else:
        guarded = parsed.filter(F.col("_ok"))
    return guarded.drop("_line", "_ok")


def read_nquads(
    spark: SparkSession, path: str, on_error: str = "raise"
) -> DataFrame:
    """``spark.read.text`` + ``parse_nquads`` — line-parallel like
    the NT reader."""
    return parse_nquads(spark.read.text(path), on_error=on_error)


# ---------------------------------------------------------------------------
# Turtle source (document-scoped: whole-file parse per task)
# ---------------------------------------------------------------------------

_TTL_TOKEN = re.compile(
    # <IRI> first (IRIREFs legally contain ';'/','); then literals
    # with optional @lang/^^dt (the datatype-QNAME charset excludes
    # the ;,. separators — a greedy \S+ swallowed trailing commas,
    # and a '.' would glue the statement terminator into the
    # datatype; internal-dot datatype qnames consequently fail fast
    # in the state machine instead of mis-parsing); then separators;
    # then qnames/keywords
    r'<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[\w-]+|\^\^(?:<[^>]*>|[^\s;,.]+))?'
    r'|[;,.]|[^\s;,]+'
)
_TTL_LIT = re.compile(
    r'^"((?:[^"\\]|\\.)*)"(?:@([\w-]+)|\^\^(<[^>]*>|[^\s;,.]+))?$')
_TTL_PREFIX = re.compile(
    r'@prefix\s+([\w-]*):\s+<([^>]*)>\s*\.\s*$')
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def parse_turtle_text(text: str):
    """Parse ONE Turtle document into ``(subj, pred, obj, obj_is_uri,
    obj_lang, obj_datatype)`` tuples.

    Covers the subset this engine's serializers emit plus common
    interchange Turtle: ``@prefix`` declarations, subject grouping
    with ``;``/``,``, qnames, ``<iri>``, the ``a`` keyword, literals
    with ``@lang`` / ``^^datatype`` (full single-pass ECHAR+UCHAR
    unescape — the same kernel the NT reader uses), ``#`` comment
    lines. Blank nodes, collections, ``@base``-relative IRIs and
    multi-line (triple-quoted) literals raise ``ValueError`` —
    fail-fast, never a silently wrong graph."""
    prefixes = {}
    triples = []

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        if tok == "a":
            return _RDF_TYPE
        if tok.startswith("_:"):
            raise ValueError("blank nodes are not supported: %r" % tok)
        if tok.startswith("[") or tok.startswith("("):
            raise ValueError(
                "blank-node lists / collections are not supported: %r"
                % tok)
        pfx, _, local = tok.partition(":")
        if pfx not in prefixes:
            raise ValueError("undeclared Turtle prefix %r" % pfx)
        return prefixes[pfx] + local

    def parse_obj(tok: str):
        m = _TTL_LIT.match(tok)
        if m:
            dt = expand(m.group(3)) if m.group(3) else None
            return (unescape_literal(m.group(1)), False, m.group(2), dt)
        return (expand(tok), True, None, None)

    body = []
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        if stripped.startswith("@prefix"):
            m = _TTL_PREFIX.match(stripped)
            if not m:
                raise ValueError("malformed @prefix line: %r" % stripped)
            prefixes[m.group(1)] = m.group(2)
            continue
        if stripped.startswith("@base") or stripped.lower().startswith(
                "base "):
            raise ValueError("@base-relative Turtle is not supported")
        body.append(stripped)
    # long (triple-quoted) literals fail in the STATE MACHINE below
    # (the empty-literal prefix tokenizes, then the body token arrives
    # where a separator is expected) — a text-level check would also
    # fire on quote runs INSIDE legitimate single-line literals
    subj = pred = None
    expect = "subj"
    toks = []
    for tok in _TTL_TOKEN.findall(" ".join(body)):
        # PN_LOCAL cannot END with '.' (Turtle grammar), so a '.'
        # glued to a qname/datatype token is the statement terminator
        if (len(tok) > 1 and tok.endswith(".")
                and not tok.startswith("<") and not tok.startswith('"')):
            toks.extend([tok[:-1], "."])
        else:
            toks.append(tok)
    for tok in toks:
        if tok == ";":
            expect = "pred"
            continue
        if tok == ",":
            expect = "obj"
            continue
        if tok == ".":
            expect = "subj"
            continue
        if expect == "subj":
            subj, expect = expand(tok), "pred"
        elif expect == "pred":
            pred, expect = expand(tok), "obj"
        elif expect == "obj":
            o, u, lg, dt = parse_obj(tok)
            triples.append((subj, pred, o, u, lg, dt))
            expect = "sep"
        else:
            raise ValueError(
                "unexpected token %r (missing '.'/';'/',')" % tok)
    if expect in ("pred", "obj"):
        raise ValueError("Turtle document ends mid-statement")
    return triples


_TTL_SCHEMA = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "obj_lang string, obj_datatype string"
)


def parse_turtle_docs(docs: DataFrame, column: str = "value") -> DataFrame:
    """Parse a DataFrame of whole Turtle DOCUMENTS (one per row in
    ``column``) into the 6-column triple table — one Arrow pass,
    shared by :func:`read_turtle` and any in-plan producer of Turtle
    text (e.g. the driver round-trip query)."""

    def gen(batches):
        cols = ["subj", "pred", "obj", "obj_is_uri", "obj_lang",
                "obj_datatype"]
        for pdf in batches:
            rows = []
            for text in pdf[column]:
                rows.extend(parse_turtle_text(text))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(gen, schema=_TTL_SCHEMA)


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Turtle reader: one WHOLE FILE per row
    (``wholetext`` — Turtle is document-scoped: prefixes and subject
    grouping carry state across lines, so unlike N-Triples it cannot
    split on newlines), parsed per-task by ``parse_turtle_text``.
    Parallelism = number of files; a single giant Turtle file should
    be converted to N-Triples first (the engine writes both)."""
    return parse_turtle_docs(spark.read.text(path, wholetext=True))
