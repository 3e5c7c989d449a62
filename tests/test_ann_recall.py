# -*- coding: utf-8 -*-
"""ANN quality gate: recall of the LSH path vs the exact baseline.
(VERDICT r01 #3: lsh_topk shipped with no recall measurement.)

Two regimes, measured separately because they answer different
questions:

* PLANTED near-duplicates (a perturbed copy of a corpus vector) —
  the workload LSH exists for (dedup / near-dup retrieval at high
  cosine): recall@5 is 1.00 on the fixture, gated at >= 0.95.
* RAW random fixture vectors — near-orthogonal noise with no
  similarity structure; hyperplane LSH has no signal to exploit and
  recall is necessarily low (measured 0.02 single-probe / 0.26 with
  probes=7 at sf0.001). Gated only on the multi-probe dial being
  monotone, and documented in BENCH.md so nobody mistakes the
  planted number for a random-topk claim.
"""

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


def test_lsh_topk_planted_near_dup_recall(spark):
    from rdf_converter_spark.operators.ann import brute_force_topk, lsh_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    two = F.lit(2.0)
    queries = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("query_id"),
        F.concat(
            F.array(
                (F.element_at("embedding", 1) * two + F.lit(0.01))
                .cast("float")
            ),
            F.transform(
                F.slice("embedding", 2, 63), lambda x: (x * two).cast("float")
            ),
        ).alias("embedding"),
    )
    # sanity: the exact top-1 of each planted query IS its source
    exact1 = _topk_sets(brute_force_topk(emb, queries, k=1))
    assert all((q - 100000) in s for q, s in exact1.items())
    got = _topk_sets(lsh_topk(emb, queries, dim=64, k=5, planes=6))
    hit = sum(1 for q in exact1 if (q - 100000) in got.get(q, set()))
    assert hit / len(exact1) >= 0.95, hit


def test_lsh_topk_multiprobe_monotone_on_random(spark):
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
    # probing more buckets can only add candidates
    assert r7 >= r1, (r1, r7)
    assert r7 >= 0.1, r7  # measured 0.26 on the fixture


def test_ivf_arrow_and_expr_paths_agree(spark):
    """The numpy batch-matmul assignment (production) and the Catalyst
    literal-fold (oracle twin) must produce identical top-k output —
    same round-6 cosine, same tie-breaks — on data with ties and
    near-boundary similarities."""
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators.ann import ivf_topk

    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            # id%50 duplicates vectors -> exact ties exercised
            lambda j: (F.sin((F.col("id") % 50) * 0.37 + j * 0.91)
                       ).cast("float"),
        ).alias("embedding"),
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_topk(emb, q, dim=16, k=5, n_cells=8, nprobe=3,
                 assignment="arrow").collect()
    b = ivf_topk(emb, q, dim=16, k=5, n_cells=8, nprobe=3,
                 assignment="expr").collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[2])) == \
        sorted(map(tuple, b), key=lambda t: (t[0], t[2]))


def test_pq_topk_planted_near_dup_recall(spark):
    """PQ/ADC must put a planted near-duplicate's source in its
    top-5: the quantization error is bounded by the codeword grid,
    tiny next to a near-zero true distance. Random-pair ordering is
    NOT asserted (PQ distorts absolute distances by design)."""
    from rdf_converter_spark.operators.ann import brute_force_topk, pq_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("query_id"),
        F.transform(
            "embedding", lambda x: (x + F.lit(0.003)).cast("float")
        ).alias("embedding"),
    )
    exact1 = _topk_sets(brute_force_topk(emb, queries, k=1))
    assert all((q - 100000) in s for q, s in exact1.items())
    got = _topk_sets(pq_topk(emb, queries, dim=64, k=5))
    hit = sum(1 for q in exact1 if (q - 100000) in got.get(q, set()))
    assert hit / len(exact1) >= 0.95, hit


def test_pq_codes_are_bounded_and_deterministic(spark):
    from rdf_converter_spark.operators.ann import pq_topk

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = pq_topk(emb, queries, dim=64, k=3).collect()
    b = pq_topk(emb, queries, dim=64, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["adist"] >= 0.0 for r in a)
