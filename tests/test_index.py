# -*- coding: utf-8 -*-
"""Positional inverted index + exact phrase search
(operators/index.py). Tokenization must line up with
textstats._words so positions agree with token counts engine-wide.
"""

import pytest

from rdf_converter_spark.operators.index import inverted_index, phrase_search

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat"),
    (3, "quick quick quick"),
    (4, ""),
    (5, "   "),
    (6, "The Quick brown fox"),  # casing folds into doc-1/2 vocab
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _idx(df):
    return {(r.term, r.doc_id): (list(r.positions), r.tf) for r in df.collect()}


def test_index_positions_and_tf(docs):
    idx = _idx(inverted_index(docs))
    assert idx[("the", 1)] == ([0, 6], 2)
    assert idx[("quick", 3)] == ([0, 1, 2], 3)
    assert idx[("dog", 1)] == ([8], 1)
    # casing folds: doc 6 indexes lowercase terms
    assert idx[("the", 6)] == ([0], 1)
    # empty / whitespace-only docs emit NO postings (split('')==[''])
    assert not any(d in (4, 5) for (_, d) in idx)


def test_index_min_df(docs):
    idx = _idx(inverted_index(docs, min_df=3))
    terms = {t for (t, _) in idx}
    # 'quick' appears in docs 1,2,3,6 (df=4); 'dog' only in doc 1
    assert "quick" in terms and "dog" not in terms
    # postings of surviving terms are untouched
    assert idx[("quick", 3)] == ([0, 1, 2], 3)


def test_phrase_search_multi_token(docs):
    got = {r.doc_id: (r.n_hits, r.first_pos)
           for r in phrase_search(docs, "quick brown").collect()}
    assert got == {1: (1, 1), 2: (1, 1), 6: (1, 1)}


def test_phrase_search_repeated_term_overlap(docs):
    # "quick quick" matches twice in doc 3 (positions 0 and 1)
    got = {r.doc_id: (r.n_hits, r.first_pos)
           for r in phrase_search(docs, "quick quick").collect()}
    assert got == {3: (2, 0)}


def test_phrase_search_single_and_missing(docs):
    got = {r.doc_id: r.n_hits
           for r in phrase_search(docs, "the").collect()}
    assert got == {1: 2, 2: 1, 6: 1}
    assert phrase_search(docs, "lazy fox").count() == 0
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_phrase_case_folds(docs):
    got = {r.doc_id for r in phrase_search(docs, "The QUICK").collect()}
    assert got == {1, 2, 6}
