# -*- coding: utf-8 -*-
"""Generic HTML -> text stripping for raw web-crawl pages.

The reference-contract extraction (`sources/extract.py`) re-derives
the *reference converter's* text byte-identically per url; a crawl
pipeline also needs the generic case — a page that is just web HTML,
no converter semantics. This is that operator: a deterministic,
JVM-only `Column` expression chain (whole-stage codegen, no Python,
no UDF) that strips markup the way WET-style extractors do:

1. drop ``<script>``/``<style>`` element bodies (code is not text);
2. drop HTML comments;
3. turn block-level closers + ``<br>`` into newlines (so paragraph
   structure survives as line structure);
4. strip every remaining tag;
5. decode the six entities that dominate real pages
   (``&lt; &gt; &quot; &#39; &nbsp; &amp;`` — ``&amp;`` LAST, so
   ``&amp;lt;`` decodes to the literal ``&lt;`` and not to ``<``);
6. collapse horizontal whitespace and blank-line runs, trim.

Every step is a ``regexp_replace`` with RE2-compatible syntax and
inline ``(?is)`` flags, so an independent SQL engine (the DuckDB
oracle) can run the *same* chain — the parity test is two
implementations of the spec, not one implementation tested against
itself.

Scale shape (100 TB lens): pure per-row expression — no shuffle, no
exchange, fused into whatever scan/projection surrounds it; the cost
is regex CPU inside codegen, the cheapest place it can live. For
payloads beyond ~1 MB/page the quadratic-free RE2 engine keeps worst
cases linear.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; (?is) = case-insensitive +
# dotall, RE2 syntax shared verbatim by Spark (Java regex) and the
# DuckDB oracle.
HTML_STRIP_STEPS = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<br\s*/?>", "\n"),
    (r"(?i)</(p|div|li|tr|h1|h2|h3|h4|h5|h6|blockquote)>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # edge strip must be part of the chain: SQL trim() removes only
    # spaces, and block-closer newlines routinely land at the edges
    (r"^\s+", ""),
    (r"\s+$", ""),
)


def html_strip(col) -> Column:
    """Strip HTML markup from a string column; returns the extracted
    text (leading/trailing whitespace trimmed)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_strip_sql(expr: str) -> str:
    """The identical chain as ANSI/DuckDB SQL over ``expr`` — used by
    the oracle so both engines execute one shared spec (the
    driver-contract discipline from the generated-SQL twins)."""
    out = expr
    for pat, rep in HTML_STRIP_STEPS:
        # SQL single-quoted strings do no backslash processing, so
        # the RE2 pattern passes through verbatim; newlines in the
        # replacement are spliced as chr(10) to stay quoting-safe.
        out = "regexp_replace(%s, '%s', '%s', 'g')" % (
            out,
            pat.replace("'", "''"),
            rep.replace("'", "''").replace("\n", "' || chr(10) || '"),
        )
    return "trim(%s)" % out
