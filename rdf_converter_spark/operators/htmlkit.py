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

from pyspark.sql import Column, DataFrame, Window
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


# --------------------------------------------------------------- links

# one anchor: href in double quotes, then the (non-greedy) element
# body up to the closing tag. RE2-compatible (no lookaround) so the
# DuckDB oracle runs the IDENTICAL pattern; single-quoted/unquoted
# href variants are out of scope (documented; real extractors
# normalize quoting upstream).
ANCHOR_RE = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def html_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """Extract the anchor link graph from raw HTML pages: one row per
    ``<a href="...">`` occurrence with its anchor text —
    ``(src_url, href, anchor)``.

    This is the web-crawl edge extractor feeding the engine's graph
    operators (``operators/graph.py``: degrees / PageRank / k-hop) and
    the mention-detection side of KG construction (anchor text is the
    classic free supervision for entity linking — the alias dictionary
    of ``operators/linker.py`` is built from exactly these pairs at
    corpus scale).

    Plan shape: ``regexp_extract_all`` runs twice over the same value
    (hrefs, then anchor bodies) and ``arrays_zip`` pairs them —
    positional alignment is exact because both calls enumerate the
    SAME match occurrences of the SAME pattern. One explode, no
    shuffle, no UDF; anchor text is stripped through
    :func:`html_strip` so markup inside the element (``<b>`` etc.)
    and entities come out as text.

    A page whose HTML contains no anchors emits no rows (inner
    explode) — callers needing the isolated-page row should left-join
    back to ``pages``."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 1)
    bodies = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2)
    pair = F.explode(F.arrays_zip(
        hrefs.alias("href"), bodies.alias("body")))
    return (
        pages.select(F.col(url_col).alias("src_url"), pair.alias("a"))
        .select(
            "src_url",
            F.col("a.href").alias("href"),
            html_strip(F.col("a.body")).alias("anchor"),
        )
    )


def anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """Aggregate the anchor-text profile of every link target — the
    KG-construction step after :func:`html_links`: across the crawl,
    the texts other pages use to link to a URL are its candidate
    entity surface forms (the classic Wikipedia-anchor supervision
    for the alias dictionary in ``operators/linker.py``).

    Per target ``href``: total in-links, distinct source pages,
    distinct anchor strings, and the dominant anchor (most frequent;
    ties broken by lexicographically smallest anchor so the result is
    engine-portable). Plan shape: the (href, anchor) count is a
    partial-aggregated groupBy; the per-href rollup aggregates THAT
    (already collapsed) table plus a distinct-source count — every
    exchange is on href, link-spam hub targets are the AQE skew case.
    No driver collection, no UDF."""
    links = html_links(pages, url_col=url_col, html_col=html_col)
    per_anchor = links.groupBy("href", "anchor").agg(
        F.count("*").alias("cnt"),
    )
    w = Window.partitionBy("href").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    top = (
        per_anchor.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("href", F.col("anchor").alias("top_anchor"))
    )
    totals = links.groupBy("href").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("src_url").alias("n_sources"),
        F.countDistinct("anchor").alias("n_anchors"),
    )
    return totals.join(top, "href")
