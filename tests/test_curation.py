# -*- coding: utf-8 -*-
"""Corpus curation: deterministic split, language quota sampling,
benchmark decontamination. These extend the reference (a fixed-archive
converter) with the training-data pipeline surface (SURVEY §2.11)."""

from pyspark.sql import functions as F

from rdf_converter_spark.operators.curation import (
    decontaminate,
    deterministic_split,
    lang_quota_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string"),
                 F.lit(" common text body "),
                 F.col("id").cast("string")).alias("text"),
        F.element_at(
            F.array(F.lit("fi"), F.lit("sv"), F.lit("en")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("lang"),
    )


def test_split_is_stable_under_corpus_growth(spark):
    """A document's split must not change when the corpus grows —
    the leakage mode of fraction-based randomSplit."""
    small = deterministic_split(_docs(spark, 100)).collect()
    big = deterministic_split(_docs(spark, 400)).collect()
    big_map = {r["doc_id"]: r["split"] for r in big}
    assert all(big_map[r["doc_id"]] == r["split"] for r in small)
    fracs = {s: 0 for s in ("train", "val", "test")}
    for r in big:
        fracs[r["split"]] += 1
    assert fracs["train"] > fracs["val"] and fracs["train"] > fracs["test"]
    assert sum(fracs.values()) == 400


def test_split_salt_redraws_assignment(spark):
    a = deterministic_split(_docs(spark, 300), salt="v1").collect()
    b = deterministic_split(_docs(spark, 300), salt="v2").collect()
    bm = {r["doc_id"]: r["split"] for r in b}
    moved = sum(1 for r in a if bm[r["doc_id"]] != r["split"])
    assert moved > 10  # a salt change re-draws a real fraction


def test_lang_quota_balances_skew(spark):
    docs = _docs(spark, 300).filter(
        (F.col("lang") != "en") | (F.col("doc_id") < 30)
    )  # en becomes a tail language with ~10 docs
    out = lang_quota_sample(docs, quota=20)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fi"] == 20 and counts["sv"] == 20
    assert counts["en"] <= 20  # tail language keeps what it has
    # deterministic: same result twice
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in lang_quota_sample(docs, quota=20).collect())


def test_decontaminate_flags_exact_ngram_overlap(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "totally different words here entirely unique"),
            (2, "prefix alpha beta gamma delta epsilon suffix"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           decontaminate(docs, bench, n=5).collect()}
    assert out[0]["contaminated"] and out[2]["contaminated"]
    assert not out[1]["contaminated"] and out[1]["n_hits"] == 0
    assert len(out) == 3  # totality: every doc exactly once


def test_decontaminate_broadcasts_benchmark_side(spark):
    docs, bench = _docs(spark, 300), _docs(spark, 10)
    plan = decontaminate(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the corpus gram table must not be exchanged for the gram join
    # (left side of the broadcast join reads straight from the scan)
    assert "SortMergeJoin" not in plan, plan


def test_decontaminate_short_docs_emit_no_grams(spark):
    """ADVICE r03: a benchmark doc with fewer than n words must not
    flag equally-short training docs (the old short-gram fallback made
    every pair of short docs 'contaminated')."""
    docs = spark.createDataFrame(
        [(0, "tiny doc"), (1, ""), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "tiny doc"), (101, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           decontaminate(docs, bench, n=5).collect()}
    assert len(out) == 3  # totality holds for gram-free docs too
    assert not any(r["contaminated"] for r in out.values())


def test_mixture_sample_rates_and_stability(spark):
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators.curation import mixture_sample

    docs = spark.createDataFrame(
        [(i, "t", "keep" if i % 2 == 0 else "half") for i in range(4000)],
        "doc_id long, text string, source string",
    )
    out = mixture_sample(docs, {"keep": 1.0, "half": 0.5})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got["keep"] == 2000  # weight 1.0 keeps everything
    assert 800 < got["half"] < 1200  # ~50%, hash-determined
    # growth-stability: adding rows never changes an existing row's fate
    bigger = docs.unionByName(spark.createDataFrame(
        [(10_000 + i, "t", "half") for i in range(100)],
        "doc_id long, text string, source string"))
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    kept_ids2 = {r["doc_id"] for r in mixture_sample(
        bigger, {"keep": 1.0, "half": 0.5}).select("doc_id").collect()}
    assert kept_ids == {i for i in kept_ids2 if i < 10_000}
    # absent source = dropped
    assert mixture_sample(docs, {"keep": 1.0}).filter(
        F.col("source") == "half").count() == 0


def test_sequence_pack_bins_and_offsets(spark):
    from rdf_converter_spark.operators.curation import sequence_pack

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           sequence_pack(docs, capacity=4).collect()}
    # cum_excl: 0, 3, 5, 9 -> bins 0,0,1,2; offsets 0,3,1,1
    assert (got[1]["bin"], got[1]["offset"]) == (0, 0)
    assert (got[2]["bin"], got[2]["offset"]) == (0, 3)
    assert (got[3]["bin"], got[3]["offset"]) == (1, 1)
    assert (got[4]["bin"], got[4]["offset"]) == (2, 1)
    assert got[3]["n_tokens"] == 4


def test_sequence_pack_empty_docs_and_string_col(spark):
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators.curation import sequence_pack

    docs = spark.createDataFrame(
        [(1, "a b", 2), (2, "", 0), (3, "   ", 0), (4, "c d e", 3)],
        "doc_id long, text string, pre long",
    )
    got = {r["doc_id"]: r for r in sequence_pack(docs, capacity=4).collect()}
    # empty/whitespace docs are 0 tokens, not 1 — they must not shift
    # later docs' bins
    assert got[2]["n_tokens"] == 0 and got[3]["n_tokens"] == 0
    assert (got[4]["bin"], got[4]["offset"]) == (0, 2)
    # a string token_col is wrapped to a Column (not AttributeError)
    got2 = {r["doc_id"]: r["n_tokens"] for r in
            sequence_pack(docs, capacity=4, token_col="pre").collect()}
    assert got2 == {1: 2, 2: 0, 3: 0, 4: 3}


def test_mixture_sample_rejects_zero_rounding_weight(spark):
    import pytest

    from rdf_converter_spark.operators.curation import mixture_sample

    docs = spark.createDataFrame(
        [(1, "t", "rare")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="zero threshold"):
        mixture_sample(docs, {"rare": 0.00001})


def test_boilerplate_strip_per_host_threshold(spark):
    from rdf_converter_spark.operators.curation import boilerplate_strip

    banner = "accept all cookies"
    pages = spark.createDataFrame(
        [
            # host A: banner on 3/3 pages (stripped), quote on 1/3 (kept)
            ("A", "a1", banner + "\nalpha one\nref a1"),
            ("A", "a2", banner + "\nalpha two\nref a2"),
            ("A", "a3", banner + "\nalpha three\nshared quote\nref a3"),
            # host B: same banner text but only 1/2 pages -> below
            # frac on B, host-scoped so A's stripping never leaks
            ("B", "b1", banner + "\nbeta one"),
            ("B", "b2", "beta two\nshared quote"),
        ],
        "host string, url string, text string",
    )
    got = {r["url"]: r for r in
           boilerplate_strip(pages, max_frac=0.6).collect()}
    assert got["a1"]["new_text"] == "alpha one\nref a1"
    assert (got["a1"]["n_lines"], got["a1"]["n_kept"]) == (3, 2)
    assert got["a3"]["new_text"] == "alpha three\nshared quote\nref a3"
    # host B keeps the banner: 1/2 pages < 0.6
    assert got["b1"]["new_text"] == banner + "\nbeta one"
    assert got["b2"]["new_text"] == "beta two\nshared quote"


def test_boilerplate_strip_min_pages_and_total_strip(spark):
    from rdf_converter_spark.operators.curation import boilerplate_strip

    pages = spark.createDataFrame(
        [
            # two-page host sharing its ONLY line: min_pages=3 protects it
            ("C", "c1", "tiny shared"),
            ("C", "c2", "tiny shared"),
            # big host where one page is ALL template
            ("D", "d1", "menu\nfooter"),
            ("D", "d2", "menu\nfooter"),
            ("D", "d3", "menu\nfooter\nreal content"),
        ],
        "host string, url string, text string",
    )
    got = {r["url"]: r for r in
           boilerplate_strip(pages, min_pages=3, max_frac=0.5).collect()}
    assert got["c1"]["new_text"] == "tiny shared"
    assert (got["d1"]["n_kept"], got["d1"]["new_text"]) == (0, "")
    assert got["d3"]["new_text"] == "real content"
    # within-page repetition counts ONE page toward the frequency
    pages2 = spark.createDataFrame(
        [("E", "e1", "x\nx\nx"), ("E", "e2", "y"), ("E", "e3", "z")],
        "host string, url string, text string",
    )
    got2 = {r["url"]: r for r in
            boilerplate_strip(pages2, min_pages=2, max_frac=0.5).collect()}
    assert got2["e1"]["new_text"] == "x\nx\nx"
