# -*- coding: utf-8 -*-
"""Deduplication family for training-data pipelines.

Exact (hash-groupBy), MinHash (shingle -> k md5-derived min-hashes ->
banded LSH bucket join), SimHash (md5 bit-sampling sign vector), and
n-gram Jaccard verification on LSH candidates. All hash math is
md5-based *string* arithmetic so the DuckDB oracle can reproduce it
bit-for-bit (no engine-specific hash functions).

Scale notes: shingling/minhashing stays inside array expressions (no
explode until the band join), so the only shuffles are the final
(band, bucket) groupBys — the canonical LSH plan. Bucket skew (a
boilerplate shingle shared by millions of docs) is bounded by banding:
hot buckets can further be salted with operators.salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def _spread(df: DataFrame) -> DataFrame:
    """Hash-expression-heavy operators are CPU-bound per row; a table
    that arrives in fewer splits than the cluster has slots (small
    files bin-packed by maxPartitionBytes) would serialize them —
    spread to the default parallelism first."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by full-text md5; survivor = min doc_id."""
    return (
        docs.select(F.md5(F.col("text")).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("group_size"),
        )
    )


def _shingles(shingle: int):
    words = _words()
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - shingle, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle))
    )


def minhash_signatures(docs: DataFrame, k: int = 8, shingle: int = 3) -> DataFrame:
    """k min-hashes: h_i(doc) = min over shingles of md5(i || ' ' || s).

    One row per doc with an array signature — computed entirely inside
    array expressions (no explode; the only exchange is the optional
    parallelism spread).
    """
    docs = _spread(docs)
    sh = _shingles(shingle)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(" "), s))
            )
        ),
    )
    return docs.select("doc_id", sig.alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, shingle: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """Banded LSH: signature split into ``bands`` rows of k/bands
    hashes; docs sharing any full band land in one bucket; emit
    candidate pairs (a < b) deduplicated across bands.

    ``max_bucket`` drops mega-buckets (boilerplate shingles shared by
    a large doc fraction): they contribute O(bucket^2) candidate pairs
    of near-zero precision and are the classic LSH skew hazard at
    corpus scale. The cap is an aggregation-side guard (count per
    bucket BEFORE the self-join), so the hot keys never reach the
    join."""
    rows_per_band = k // bands
    # materialize signatures before banding: Catalyst's projection
    # collapse would otherwise inline the (k x shingles md5) signature
    # expression into EVERY band struct, recomputing it per band
    sigs = minhash_signatures(docs, k=k, shingle=shingle).localCheckpoint(
        eager=False
    )
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "|", F.slice(F.col("signature"), b * rows_per_band + 1,
                                     rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    sizes = banded.groupBy("band", "bucket").count()
    small = sizes.filter(F.col("count") <= max_bucket).select("band", "bucket")
    pruned = banded.join(small, ["band", "bucket"])
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, shingle: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification
    stage after LSH)."""
    docs = _spread(docs)
    sets_ = docs.select(
        "doc_id", F.array_distinct(_shingles(shingle)).alias("sh")
    )
    a = sets_.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "doc_a", "doc_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over words: bit b of md5(word) votes +1/-1; fingerprint
    bit = sign of the vote sum. Hex-digit arithmetic is done with
    ``instr`` string ops so DuckDB reproduces it exactly."""
    docs = _spread(docs)
    words = _words()
    hexmap = "0123456789abcdef"

    def bit_of(word, b):
        # hex digit index: b // 4 (1-based substr), bit within: b % 4
        digit = F.substring(F.md5(word), (b / 4).cast("int") + 1, 1)
        val = F.instr(F.lit(hexmap), digit) - 1
        return F.floor(val / F.pow(F.lit(2.0), (b % 4).cast("double"))).cast(
            "int"
        ) % 2

    bitcols = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.aggregate(
                words,
                F.lit(0),
                lambda acc, w: acc + (bit_of(w, b) * 2 - 1),
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return docs.select(
        "doc_id", F.concat_ws("", bitcols).alias("simhash")
    )


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    Brute-force within id-bucket blocks here; at corpus scale the
    blocking key comes from an LSH/IVF bucket (see operators.ann).
    Cosine = zip_with dot / norms, sequential double math (bit-stable
    across engines).
    """
    e = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return pairs
