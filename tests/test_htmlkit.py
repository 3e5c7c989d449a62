# -*- coding: utf-8 -*-
"""Generic HTML stripping (operators/htmlkit.py) — Spark chain vs the
DuckDB compilation of the same step table, plus semantic pins."""
import duckdb

from rdf_converter_spark.operators.htmlkit import html_strip, html_strip_sql

CASES = [
    # (html, expected text)
    ("<p>hello</p>", "hello"),
    ("<script>var x = '<p>not text</p>';</script>after", "after"),
    ("<style>p { color: red }</style>body", "body"),
    ("<!-- secret -->visible", "visible"),
    ("a<br>b<br/>c", "a\nb\nc"),
    ("<p>one</p><p>two</p>", "one\ntwo"),
    ("A &amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39; &nbsp;.", 'A & B <x> "q" \'s\' .'),
    # double-encoded entity must decode ONE level (&amp; last)
    ("&amp;lt;", "&lt;"),
    ("  spaced\t\tout  ", "spaced out"),
    ("<div>x</div>\n\n\n<div>y</div>", "x\ny"),
    ("<SCRIPT>UPPER</SCRIPT>ok", "ok"),
    ("<a href='z'>link</a> text", "link text"),
]


def test_html_strip_semantics(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], ["html"])
    got = [r.out for r in
           df.select(html_strip("html").alias("out")).collect()]
    assert got == [e for _, e in CASES]


def test_html_strip_sql_twin_matches_spark(spark):
    """The DuckDB compilation of HTML_STRIP_STEPS must agree with the
    Spark chain on every case — two engines, one spec."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT %s AS out FROM (SELECT unnest(?) AS h)"
        % html_strip_sql("h"), [[h for h, _ in CASES]],
    ).fetchall()
    assert [r[0] for r in rows] == [e for _, e in CASES]


def test_html_links_extraction(spark):
    from rdf_converter_spark.operators.htmlkit import html_links

    pages = spark.createDataFrame([
        ("p1", '<a href="u1">one</a> mid <A HREF="u2">Two &amp; <b>half</b></A>'),
        ("p2", '<a name="no-href">skip</a><a rel="x" href="u3">three</a>'),
        ("p3", "no anchors here"),
    ], ["url", "html_text"])
    got = sorted((r.src_url, r.href, r.anchor)
                 for r in html_links(pages).collect())
    assert got == [
        ("p1", "u1", "one"),
        ("p1", "u2", "Two & half"),
        ("p2", "u3", "three"),
    ]
