# -*- coding: utf-8 -*-
"""Text analysis for training-data pipelines over a ``documents``
table (doc_id, text, lang, source, n_chars).

Everything is built from native ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python in the hot path. Each operator has an
ANSI-SQL twin (see __spark_entry__.oracle_sql) used as the DuckDB
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic, language-marker stopword sets (lowercase, whole-word)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "fr": ["le", "la", "les", "et", "de"],
    "fi": ["ja", "on", "ei", "että", "hän"],
    "de": ["der", "die", "und", "das", "nicht"],
}

STOPWORDS = sorted(set(w for ws in LANG_MARKERS.values() for w in ws))


def _words(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (runs of letters / digits /
    single punctuation, the usual pre-tokenizer regex)."""
    bpe = F.regexp_replace(
        F.lower(F.col("text")), r"[a-z]+|[0-9]|[^a-z0-9\s]", "x"
    )
    return docs.select(
        "doc_id",
        F.size(_words()).cast("long").alias("ws_tokens"),
        F.length(F.regexp_replace(bpe, r"\s", "")).cast("long").alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics (fixed weights)."""
    n_chars = F.length("text")
    punct = F.length(F.regexp_replace("text", r"[^!-/:-@\[-`{-~]", ""))
    words = _words()
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(STOPWORDS))
    )
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_calc"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6).alias("stop_ratio"),
        n_words.cast("long").alias("n_words"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language guess: argmax of per-language hit counts,
    ties broken by language code order; 'und' when no marker hits."""
    words = _words()

    def hit_counter(markers):
        # NOTE: a two-arg lambda would be treated as (element, index)
        # by F.filter — keep the closure single-arg
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    scores = [
        hit_counter(markers).alias(code)
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    codes = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(c) for c in codes])
    guess = F.lit("und")
    for c in reversed(codes):  # earlier codes win ties
        guess = F.when((F.col(c) == best) & (best > 0), F.lit(c)).otherwise(guess)
    return scored.select(
        "doc_id", F.col("lang").alias("lang_declared"),
        guess.alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, shingle: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over word 5-gram shingles
    (winnowing-style rolling selection, min-sampled)."""
    words = _words()
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words) - shingle, F.lit(0))
    )
    shingles = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(words, i + 1, shingle))
        ),
    )
    return docs.select(
        "doc_id", F.array_min(shingles).alias("fingerprint")
    )


# PII patterns (redaction order matters: emails contain digits/dots
# that the phone/ip patterns must not half-match afterwards)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, international phone numbers and IPv4 addresses
    (the standard pre-training scrub pass) — pure regexp, counted via
    ``regexp_count`` so the pipeline can report removal rates."""
    t = F.col(text_col)
    out = docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                PHONE_RE, "<PHONE>",
            ),
            IPV4_RE, "<IP>",
        ).alias("scrubbed"),
    )
    return out


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetition quality signals (Gopher-style filters): fraction of
    duplicate lines and distinct-bigram ratio — low distinct ratios
    flag boilerplate/spam. Array expressions only, no shuffle."""
    lines = F.split(F.col("text"), r"\n")
    words = _words()
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
    )
    return docs.select(
        "doc_id",
        F.round(
            1.0
            - F.size(F.array_distinct(lines))
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.size(F.array_distinct(bigrams))
            / F.greatest(F.size(bigrams), F.lit(1)),
            6,
        ).alias("distinct_bigram_ratio"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k characteristic terms per document by a RATIONAL tf-idf:
    ``score = tf * N * 10^6 // df`` (integer-exact — a float
    ``log(N/df)`` ranks identically only up to last-ulp libm
    differences between engines, which an oracle hash-compare cannot
    tolerate; the rational idf is monotone in 1/df, so per-doc
    ordering matches log-idf whenever tf ties don't mask it, and is
    bit-reproducible everywhere). Two exchanges at scale: the
    (doc, term) tf aggregate and the term df aggregate, joined on
    ``term`` with NO broadcast hint — a web-crawl vocabulary runs
    10^9+ distinct terms and must never be forced driver-side; AQE
    still broadcasts it at runtime whenever it actually is small.
    The corpus size N enters the plan as a broadcast 1-row aggregate
    (parquet count-star, footer-only) instead of a separate
    ``docs.count()`` action, so the whole query is ONE job with ONE
    scan of the exploded terms. Rank window is per-doc. Ties: score
    desc, term asc."""
    from pyspark.sql import Window

    n_docs = docs.groupBy().agg(F.count("*").alias("_n_docs"))
    terms = docs.select(
        "doc_id", F.explode(_words()).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # integral DIV, not double '/'+floor: double quotients can land
    # one ulp under an exact integer and floor() off-by-one vs the
    # oracle's exact BIGINT '//'
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.expr("(tf * _n_docs * CAST(1000000 AS BIGINT)) DIV df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term",
                F.col("rank").cast("long").alias("rank"), "score")
    )


def cm_heavy_hitters(
    docs: DataFrame, k: int = 20, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min-sketch word frequencies next to the exact counts —
    the BOUNDED-MEMORY corpus statistic for keyspaces too wide to
    aggregate exactly (URL hosts, rare tokens: 10^9+ distinct keys at
    crawl scale). The sketch is ``depth`` rows of ``width`` counters;
    every partition combines into at most depth*width cells map-side,
    so the exchange carries O(partitions * depth * width) rows no
    matter the corpus — and the finished sketch (depth*width rows) is
    broadcastable at ANY scale, unlike a vocabulary. Estimates are
    ``min`` over the depth rows (classic CM upper bound: est >=
    exact always, with overestimation from bucket collisions).
    Returns the exact top-``k`` terms with both numbers so collisions
    are measurable; the engine-portable bucket hash is the md5-prefix
    used across the dedup family. Ties: exact desc, gram asc."""
    grams = docs.select(F.explode(_words()).alias("gram")).filter(
        F.col("gram") != ""
    )
    exact = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("gram").asc())
        .limit(k)
    )

    def bucket(gram_col, r_col):
        return F.conv(
            F.substring(
                F.md5(F.concat(gram_col, F.lit("|cm"),
                               r_col.cast("string"))), 1, 8
            ), 16, 10,
        ).cast("long") % width

    rs = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    sketch = (
        grams.select("gram", rs)
        .select("r", bucket(F.col("gram"), F.col("r")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    cand = exact.select("gram", "n_exact", rs).select(
        "gram", "n_exact", "r", bucket(F.col("gram"), F.col("r")).alias("bucket")
    )
    return (
        cand.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("gram", "n_exact")
        .agg(F.min("cnt").alias("n_est"))
        .orderBy(F.col("n_exact").desc(), F.col("gram").asc())
    )


def ngram_counts(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level top-k word n-grams with counts — the corpus
    statistic a tokenizer/LM-data audit starts from. One partial-
    aggregated exchange over the exploded grams; top-k via a global
    sort of the (tiny) aggregated gram table. Ties: count desc,
    gram asc."""
    words = _words()
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )
    return (
        docs.select(F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(k)
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization + casefold — the canonical first step
    of any dedup/fingerprint chain over a real crawl, where the same
    page arrives composed (U+00E9) from one host and decomposed
    (e + U+0301) from another and every downstream hash treats them as
    different documents.

    Spark has no NFC builtin, so this is the one textstats operator
    that leaves the JVM: an Arrow-batched pandas UDF around
    ``unicodedata.normalize`` (stdlib, C-implemented) — still
    vectorized per batch, no per-row Python round trips. Codepoint
    counts before/after come from JVM ``length``.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # one struct-returning UDF call per batch — a separate length()
    # over a second nfc() call would run the Python stage twice
    # (CollapseProject inlines projections)
    def _nfc(s):
        import unicodedata

        norm = s.map(
            lambda t: unicodedata.normalize("NFC", t).lower()
            if t is not None
            else None
        )
        return pd.DataFrame(
            {"norm_text": norm, "n_cp_norm": norm.str.len()}
        )

    # no type hints: the struct-returning Series -> DataFrame shape is
    # only reachable through the legacy scalar pandas UDF constructor
    nfc = pandas_udf(_nfc, "norm_text string, n_cp_norm long")

    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_cp_raw"),
        nfc(F.col(text_col)).alias("_n"),
    ).select(
        "doc_id",
        F.col("_n.norm_text").alias("norm_text"),
        "n_cp_raw",
        F.col("_n.n_cp_norm").alias("n_cp_norm"),
    )


def length_percentiles(docs: DataFrame) -> DataFrame:
    """Per-language document-length distribution — the corpus audit
    behind any length-filter threshold choice. EXACT interpolated
    percentiles (``percentile``, not approx_percentile) at the dyadic
    quantiles .25/.5/.75: integer inputs interpolated at quarter
    fractions are exactly representable doubles, so the DuckDB
    ``quantile_cont`` twin matches bit-for-bit. One partial-aggregated
    exchange on the (tiny-cardinality) language key; at crawl scale
    exact per-group percentiles sort only within each language
    partition. Swap to approx_percentile when the per-language row
    count no longer fits a task's sort budget."""
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.round(F.expr("percentile(n_chars, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 6).alias("p75"),
        F.max("n_chars").alias("max_chars"),
    )


def corpus_rollup(docs: DataFrame) -> DataFrame:
    """OLAP rollup over (lang, source): doc counts and char totals at
    every level — per (lang, source), per lang subtotal, grand total —
    in ONE pass (Spark expands the grouping sets map-side; no
    self-union of three aggregations). ``grouping_id`` disambiguates a
    genuine NULL group key from a rollup subtotal row."""
    return docs.rollup("lang", "source").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def bm25_score(
    docs: DataFrame, terms: list[str], k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25 relevance of every matching document for a fixed query
    term set. The idf uses the same RATIONAL form as ``tfidf_topk``
    (``N * 10^6 // df`` — a float ``ln((N-df+.5)/(df+.5))`` ranks the
    same but libm last-ulp differences break cross-engine equality);
    the saturation term is the standard tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl)). Returns ALL docs containing >= 1 query term (a
    top-k cut on a float boundary is not deterministic across
    engines; cut downstream on the rounded score).

    Exchanges: one (doc, term) tf aggregate over the exploded match
    list + two broadcast-sized scalar aggregates (corpus N + avgdl,
    df per query term — bounded by the query vocabulary, which unlike
    the corpus vocabulary IS broadcastable)."""
    words = _words()
    dl = F.size(words).cast("double")
    matches = docs.select(
        "doc_id",
        dl.alias("dl"),
        F.explode(
            F.filter(words, lambda w: w.isin(list(terms)))
        ).alias("term"),
    )
    # tf feeds both the df aggregation and the scored join — no
    # materialization needed: the aggregation exchange is identical on
    # both paths and AQE's ReusedExchange computes it once (verified:
    # an eager localCheckpoint here measured SLOWER, 3.5 s -> 6.5 s)
    tf = matches.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(words)).alias("avgdl"),
    )
    idf = F.expr("CAST(n_docs * 1000000 AS BIGINT) DIV df").cast("double")
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * sat), 6).alias("score"))
    )


def _bitlen_case(col: str, bits: int = 54) -> str:
    """SQL CASE ladder computing bit_length of a non-negative integer
    column — the SAME generated text runs in Spark ``expr`` and the
    DuckDB oracle, so no engine-specific log2 (whose last-ulp libm
    differences make floor(log2(2^k - 1)) flip to k) is involved."""
    return (
        "CASE "
        + " ".join(
            "WHEN %s >= %d THEN %d" % (col, 1 << (k - 1), k)
            for k in range(bits, 0, -1)
        )
        + " ELSE 0 END"
    )


def hll_distinct(docs: DataFrame, shingle: int = 3, m: int = 64) -> DataFrame:
    """Per-language HyperLogLog distinct-shingle estimate NEXT TO the
    exact count — the bounded-memory sketch a 10^12-doc corpus audit
    uses where countDistinct's full shuffle of every distinct value
    won't fit. Register state is m=64 counters per language,
    REGARDLESS of corpus size; the exact twin is computed here only
    to exhibit the error and for the oracle.

    Deterministic md5 register mapping (60-bit value: low 6 bits pick
    the bucket, the top 54 feed the leading-zero rank via a generated
    CASE ladder shared verbatim with the DuckDB twin) and the raw HLL
    estimator with dyadic 2^-M terms — every arithmetic step is
    engine-exact, so the oracle matches bit-for-bit. Raw regime only:
    valid when n >> 2.5*m (small-range linear counting needs ln,
    which is not cross-engine-exact)."""
    words = _words()
    idx = F.sequence(
        F.lit(0), F.greatest(F.size(words) - shingle, F.lit(0))
    )
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle))
    )
    # items feeds both the sketch path and the exact twin; the
    # distinct's exchange is shared via ReusedExchange, so no
    # materialization (an eager localCheckpoint measured slower)
    items = docs.select(
        "lang", F.explode(grams).alias("item")
    ).dropDuplicates()
    hashed = items.select(
        "lang",
        F.conv(F.substring(F.md5("item"), 1, 15), 16, 10)
        .cast("long")
        .alias("v"),
    )
    # integer DIV: float division of a 60-bit value loses bits past
    # 2^53 and floor()s to the wrong register rank
    r = hashed.select(
        "lang",
        (F.col("v") % m).alias("bucket"),
        F.expr("v DIV %d" % m).alias("rest"),
    )
    reg = r.groupBy("lang", "bucket").agg(
        F.max(55 - F.expr(_bitlen_case("rest"))).alias("mj")
    )
    alpha_m2 = (0.7213 / (1.0 + 1.079 / float(m))) * float(m * m)
    est = reg.groupBy("lang").agg(
        F.round(
            F.lit(alpha_m2)
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("mj")))
                + (m - F.count("*"))
            ),
            6,
        ).alias("n_est")
    )
    exact = items.groupBy("lang").agg(
        F.count("*").alias("n_exact")
    )
    return exact.join(est, "lang")
