# -*- coding: utf-8 -*-
"""Positional inverted index + phrase search over the document corpus.

The retrieval-side complement of ``textstats.bm25_score``: instead of
scoring a fixed query against every document, build the (term ->
postings) table once and answer exact phrase queries against it — the
primitive behind corpus inspection tools ("show me every document
containing this exact sentence") and the contamination-audit flow
(``curation.decontaminate`` flags n-gram overlap; phrase search
localizes WHERE the overlap sits).

Scale shape (100 TB lens):
- ``inverted_index`` is ONE posexplode + ONE hash aggregate keyed on
  (term, doc_id) — partial aggregation collapses each document's
  repeats map-side, and the only exchange is the aggregate's. The
  output is naturally term-partitioned: written bucketed by term it
  serves point lookups without touching the corpus again.
- ``phrase_search`` never scans the index: it filters the posting
  stream to the phrase's terms (a pushed-down IN over the scan — the
  corpus is read once, pruned to two columns), then aligns adjacent
  terms with equi-joins on (doc_id, start_position). Every join key
  includes doc_id, so a phrase of length k is k-1 co-partitioned
  joins on data that has already been cut to the query vocabulary —
  at crawl scale that is orders of magnitude below the corpus, and a
  stop-word-heavy phrase degrades to the classic IR worst case, not
  to a crash (the first-join cut dominates).

Tokenization matches ``textstats._words`` (lower + trim + split on
whitespace) so index positions line up with token counts everywhere
else in the engine; ``split('') == ['']`` yields an empty-string term
that is filtered out, emitting NO postings for empty documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_converter_spark.operators.textstats import _words


def _postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos) posting stream; positions are 0-based
    token offsets under the shared tokenizer."""
    return (
        docs.select(
            "doc_id",
            F.posexplode(_words(text_col)).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )


def inverted_index(
    docs: DataFrame, text_col: str = "text", min_df: int = 1
) -> DataFrame:
    """Positional inverted index: one row per (term, doc_id) with the
    sorted in-document position list and term frequency; ``min_df``
    drops hapax noise terms when > 1 (df computed with ONE extra
    aggregate over the already-collapsed postings, never the corpus).

    Returns (term, doc_id, positions array<int>, tf)."""
    idx = _postings(docs, text_col).groupBy("term", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").cast("long").alias("tf"),
    )
    if min_df > 1:
        df_ = idx.groupBy("term").agg(F.count("*").alias("_df"))
        idx = (idx.join(df_, "term")
               .filter(F.col("_df") >= min_df).drop("_df"))
    return idx


def phrase_search(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """Exact consecutive-token phrase match. Returns one row per
    matching document: (doc_id, n_hits, first_pos) where positions
    are the 0-based offset of the phrase's first token.

    The i-th phrase term's postings are shifted by -i so every join
    aligns on the phrase START position: k terms -> k-1 equi-joins on
    (doc_id, p), all co-partitioned on the same key."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    posts = _postings(docs, text_col).filter(F.col("term").isin(terms))
    cur = (posts.filter(F.col("term") == terms[0])
           .select("doc_id", F.col("pos").alias("p")))
    for i, t in enumerate(terms[1:], start=1):
        nxt = (posts.filter(F.col("term") == t)
               .select("doc_id", (F.col("pos") - i).alias("p")))
        cur = cur.join(nxt, ["doc_id", "p"])
    return cur.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("p").cast("int").alias("first_pos"),
    )
