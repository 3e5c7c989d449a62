# -*- coding: utf-8 -*-
"""Pipeline invariants from BASELINE input_hint."""

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_text_byte_identical_per_url(spark, corpus):
    """Re-deriving `text` from `html` inside an Arrow UDF must equal
    the stored column for EVERY url (byte-identical invariant)."""
    import os

    from rdf_converter_spark.sources.extract import extract_text
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    web = read_web_pages(spark, os.path.join(corpus, "web_pages"))
    routed = route(web)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def check(batches):
        import pandas as pd

        for pdf in batches:
            ok = [
                extract_text(dt, bytes(p), filename=f) == t
                for dt, p, f, t in zip(
                    pdf["doc_type"], pdf["payload"], pdf["file"], pdf["text"]
                )
            ]
            yield pd.DataFrame({"url": pdf["url"], "ok": ok})

    res = routed.select("url", "doc_type", "payload", "file", "text").mapInPandas(
        check, schema
    )
    bad = res.filter(~F.col("ok")).count()
    total = res.count()
    assert total > 0 and bad == 0, "%d/%d urls diverge" % (bad, total)


def test_column_pruning_reaches_scan(spark, corpus):
    """A text-only projection must not read the (heavy) html column:
    the parquet ReadSchema must contain text but not html."""
    import os

    from rdf_converter_spark.sources.web_pages import read_web_pages

    web = read_web_pages(spark, os.path.join(corpus, "web_pages"))
    plan = web.select("url", "text")._jdf.queryExecution().executedPlan().toString()
    assert "text" in plan
    assert "html" not in plan, plan
