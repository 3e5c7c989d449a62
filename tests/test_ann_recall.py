# -*- coding: utf-8 -*-
"""ANN quality gate: recall@5 of the LSH path vs the exact baseline,
and the multi-probe dial's monotonicity. (VERDICT r01 #3: lsh_topk
shipped with no recall measurement.)"""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx, exact):
    num = den = 0
    for q, want in exact.items():
        den += len(want)
        num += len(want & approx.get(q, set()))
    return num / max(den, 1)


def test_lsh_topk_recall_and_multiprobe(spark):
    from rdf_converter_spark.operators.ann import brute_force_topk, lsh_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _topk_sets(brute_force_topk(emb, queries, k=5))
    r1 = _recall(
        _topk_sets(lsh_topk(emb, queries, dim=64, k=5, planes=6)), exact
    )
    r7 = _recall(
        _topk_sets(
            lsh_topk(emb, queries, dim=64, k=5, planes=6, probes=7)
        ),
        exact,
    )
    # multi-probe must not lose candidates (supersets of buckets)
    assert r7 >= r1, (r1, r7)
    # empirical floors on the fixture corpus (measured, with margin)
    assert r1 >= 0.25, r1
    assert r7 >= 0.55, r7
