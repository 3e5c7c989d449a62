# -*- coding: utf-8 -*-
"""Deduplication family for training-data pipelines.

Exact (hash-groupBy), MinHash (shingle -> k universal-hash min-hashes
-> banded LSH bucket join), SimHash (md5 bit-sampling sign vector),
and n-gram Jaccard verification on LSH candidates.

MinHash scheme (engine-portable AND cheap): per shingle s compute ONE
md5 and take x = int(md5(s)[:8], 16); the k hash families are then
h_i(x) = (A_i * x + B_i) mod P (P prime > 2^32, A_i/B_i fixed
constants < 2^30 so A_i * x < 2^62 never overflows signed 64-bit in
any engine). DuckDB reproduces it bit-for-bit via
CAST('0x' || substr(md5(s), 1, 8) AS BIGINT). The previous scheme
(k separate md5 calls per shingle) cost ~k x the md5 work — 40% of
the r01 headline. An xxhash64 variant (``hash_fn="xxhash64"``) is
kept for JVM-only production runs; it is not oracle-reproducible.

Scale notes: shingling/minhashing stays inside array expressions (no
explode until the band join), and the k mins are folded in a SINGLE
``aggregate`` pass over the shingle array so the per-shingle md5 is
evaluated exactly once (a transform-per-i formulation would inline
and recompute it k times — Catalyst does not CSE across lambda
bodies). The only shuffles are the final (band, bucket) groupBys —
the canonical LSH plan. Bucket skew (a boilerplate shingle shared by
millions of docs) is bounded by banding + the ``max_bucket`` cap;
hot buckets can further be salted with operators.salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# universal-hash family constants: P prime > 2^32; A/B from a fixed
# pseudo-random table (< 2^30, odd A). Extend the lists to raise max k.
MH_P = 4294967311
MH_A = [
    824633721, 143165577, 617001253, 986342471,
    371293123, 533000401, 715827883, 908394733,
    121001171, 677003573, 814357891, 466344409,
    256203221, 593412137, 739613941, 101159989,
]
MH_B = [
    406247891, 918273645, 123456791, 564738291,
    192837465, 837465129, 293847561, 456789123,
    615243879, 111111113, 222222227, 333333331,
    444444443, 555555557, 666666671, 777777777,
]


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


def _shingle_hash(s: Column) -> Column:
    """x(s) = int(md5(s)[:8], 16) — the ONE expensive hash per shingle."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    docs: DataFrame, k: int = 8, shingle: int = 3, hash_fn: str = "universal"
) -> DataFrame:
    """k min-hashes per doc as an array<long> signature.

    ``hash_fn="universal"`` (default): h_i = (A_i * x + B_i) mod P over
    x = one md5 per shingle — DuckDB-reproducible.
    ``hash_fn="xxhash64"``: JVM-native seeded xxhash64 per (i, shingle)
    — fastest, not oracle-reproducible.

    Computed entirely inside array expressions (no explode; the only
    exchange is the optional parallelism spread). The universal path
    folds all k mins in one ``aggregate`` pass so each shingle is
    hashed exactly once regardless of k.
    """
    if k > len(MH_A):
        raise ValueError("k > %d needs more MH_A/MH_B constants" % len(MH_A))
    docs = _spread(docs)
    sh = _shingles(shingle)
    if hash_fn == "xxhash64":
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.array_min(
                F.transform(sh, lambda s: F.xxhash64(i, s))
            ),
        )
    else:
        a_arr = F.array(*[F.lit(a).cast("long") for a in MH_A[:k]])
        b_arr = F.array(*[F.lit(b).cast("long") for b in MH_B[:k]])
        xs = F.transform(sh, _shingle_hash)
        sig = F.aggregate(
            xs,
            F.array_repeat(F.lit(MH_P).cast("long"), k),
            lambda acc, x: F.zip_with(
                acc,
                F.sequence(F.lit(1), F.lit(k)),
                lambda m, i: F.least(
                    m,
                    (F.element_at(a_arr, i) * x + F.element_at(b_arr, i))
                    % MH_P,
                ),
            ),
        )
    return docs.select("doc_id", sig.alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4, shingle: int = 3,
    max_bucket: int = 64, hash_fn: str = "universal",
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
    sigs = minhash_signatures(
        docs, k=k, shingle=shingle, hash_fn=hash_fn
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.slice(F.col("signature"),
                                    b * rows_per_band + 1, rows_per_band),
                            lambda h: h.cast("string"),
                        ),
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
    embeddings: DataFrame, threshold: float = 0.95, dim: int = 64,
    planes: int = 8, bands: int = 2, max_bucket: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold, blocked
    by banded random-hyperplane LSH (operators.ann.lsh_signature).

    The r01 version joined ``a x b`` on ``id_a < id_b`` — a cartesian
    product, O(N^2) at corpus scale. Here every vector gets a
    ``planes``-bit sign signature, split into ``bands`` bands; vectors
    sharing any full band are paired WITHIN that (band, bucket) group
    only — candidate volume is sum of bucket^2 per band instead of
    N^2, and a near-identical pair agrees on all signs with high
    probability so recall stays near 1 at high thresholds. Buckets
    above ``max_bucket`` are dropped BEFORE the self-join (the LSH
    skew guard, same shape as minhash_lsh_pairs). Cosine = zip_with
    dot / norms, sequential double math (bit-stable across engines;
    the DuckDB oracle reproduces signature + banding + cosine).
    """
    from .ann import lsh_signature

    rows_per_band = planes // bands
    e = lsh_signature(embeddings, dim, planes).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "bucket",
    ).localCheckpoint(eager=False)
    banded = e.select(
        "vec_id", "v",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.substring(
                        F.col("bucket"),
                        b * rows_per_band + 1, rows_per_band
                    ).alias("bkt"),
                ),
            )
        ).alias("bb"),
    ).select("vec_id", "v", "bb.band", "bb.bkt")
    sizes = banded.groupBy("band", "bkt").count()
    small = sizes.filter(F.col("count") <= max_bucket).select("band", "bkt")
    pruned = banded.join(small, ["band", "bkt"])
    a = pruned.select(
        "band", "bkt", F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    b = pruned.select(
        "band", "bkt", F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = (
        a.join(b, ["band", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
    return pairs


def near_dup_clusters(
    docs: DataFrame, k: int = 8, bands: int = 4, shingle: int = 3,
    max_bucket: int = 64, hash_fn: str = "universal",
) -> DataFrame:
    """Crawl-level near-duplicate CLUSTERING: LSH candidate pairs
    (minhash_lsh_pairs) unioned transitively into connected components
    (operators.cc large/small-star), then one canonical survivor per
    cluster — the smallest doc_id, the deterministic keep-rule a
    training-data dedup pass needs (pairs alone under-remove: a~b and
    b~c must collapse to ONE kept doc even when a~c was never a
    candidate). Returns every document exactly once:
    (doc_id, cluster = smallest doc_id of its component,
    is_canonical = doc_id == cluster); singletons are their own
    cluster. Vertex ids are zero-padded so the component min (string
    order) equals the numeric min — to 20 chars, the full int64 digit
    width, because ``lpad`` TRUNCATES longer strings and a 12-char
    pad would silently collide doc_ids >= 10^12 (exactly the scale
    this module targets)."""
    from .cc import connected_components

    def key(c):
        return F.lpad(F.col(c).cast("string"), 20, "0")

    pairs = minhash_lsh_pairs(
        docs, k=k, bands=bands, shingle=shingle,
        max_bucket=max_bucket, hash_fn=hash_fn,
    )
    edges = pairs.select(key("doc_a").alias("src"), key("doc_b").alias("dst"))
    comps = connected_components(edges)
    out = docs.select("doc_id").join(
        comps, key("doc_id") == F.col("vertex"), "left"
    )
    cluster = F.coalesce(
        F.col("component").cast("long"), F.col("doc_id")
    )
    return out.select(
        "doc_id",
        cluster.alias("cluster"),
        (F.col("doc_id") == cluster).alias("is_canonical"),
    )


def span_dedup(docs: DataFrame, window: int = 8) -> DataFrame:
    """Exact-substring duplication statistics, the fixed-window
    approximation of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): hash every OVERLAPPING
    ``window``-word span of every document; a span whose exact text
    occurs in >= 2 DISTINCT documents is duplicated. Per document
    report ``(doc_id, n_spans, dup_spans, dup_ratio)`` — the curation
    signal used to drop or trim documents that mostly restate corpus
    content (licence boilerplate, syndicated articles, mirrored
    pages). Complements :func:`line_dedup`: that one removes chunks
    repeated anywhere (including within one doc) and reassembles
    text; this one measures cross-document repetition with full
    overlap resolution, the exact-substring analog of the suffix-
    array pass in the paper.

    Plan shape (100 TB lens): spans are an in-row ``transform`` over
    the split words (one md5 per span, no UDF); ONE explode; the
    duplicated-span set is a partial-aggregated count over the
    (doc, span) DISTINCT pairs (within-doc repeats collapse BEFORE
    the frequency count so self-repetition never fakes corpus
    duplication); per-doc counting is a semi join of span instances
    against the duplicated keys — both sides hash-partitioned on the
    span key, and AQE broadcasts the duplicated set when it is small.
    ``n_spans`` is a pure expression on the input row (no second
    corpus aggregate). State per span key is one counter; nothing
    all-pairs.

    A document with fewer than ``window`` words (or whitespace-only
    text, whose ``split`` yields ``['']``) has 0 spans and reports
    ``dup_ratio = 0.0`` — short docs are never flagged by spans they
    cannot contain (the ADVICE r4 short-gram rule applied here from
    the start)."""
    words = _words()
    n_words = F.when(
        F.trim(F.col("text")) == "", F.lit(0)
    ).otherwise(F.size(words))
    n_spans = F.greatest(n_words - window + 1, F.lit(0))
    idx = F.when(
        n_spans > 0, F.sequence(F.lit(0), n_spans - 1)
    ).otherwise(F.array().cast("array<int>"))
    spans = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, window)))
    )
    inst = _spread(docs).select("doc_id", F.explode(spans).alias("h"))
    dup = (
        inst.distinct()  # (doc, span) pairs: within-doc repeats collapse
        .groupBy("h").agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    cnt = (
        inst.join(dup, "h", "left_semi")
        .groupBy("doc_id").agg(F.count("*").alias("dup_spans"))
    )
    base = docs.select("doc_id", n_spans.cast("long").alias("n_spans"))
    dup_c = F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long")
    return base.join(cnt, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        dup_c.alias("dup_spans"),
        F.when(F.col("n_spans") > 0, dup_c / F.col("n_spans"))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
    )


def line_dedup(docs: DataFrame, width: int = 5) -> DataFrame:
    """CCNet-style line-level corpus dedup: split every document into
    fixed-width word chunks (the "lines" of a corpus whose documents
    have no newlines), drop every chunk whose exact text occurs more
    than once ANYWHERE in the corpus, and reassemble what remains in
    original order. Boilerplate — headers, footers, cookie banners —
    repeats across pages and is exactly what this removes before
    training.

    Plan shape: posexplode -> partial-aggregated frequency count on
    the chunk key -> join chunks to frequencies (both sides hashed on
    the SAME chunk key, so the join reuses the aggregation's
    partitioning) -> per-doc sort_array reassembly. Nothing all-pairs,
    state per key is one counter; survives a crawl-scale corpus.

    Returns every input doc: (doc_id, n_chunks, n_kept, new_text).
    Chunking is CEILING-based: the trailing (n_words mod width) words
    form a final short chunk instead of being silently dropped — a
    dedup operator must only ever remove corpus-repeated content,
    never a document's own tail. Whitespace-only docs have 0 chunks.
    """
    words = _words()
    n_words = F.when(
        F.trim(F.col("text")) == "", F.lit(0)
    ).otherwise(F.size(words))
    n_chunks = F.ceil(n_words / width).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i * width + 1, width))
    )
    exploded = docs.select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        F.posexplode_outer(chunks).alias("chunk_no", "chunk"),
    )
    freq = (
        exploded.filter(F.col("chunk").isNotNull())
        .groupBy("chunk")
        .agg(F.count("*").alias("f"))
    )
    kept = (
        exploded.join(freq, "chunk")
        .filter(F.col("f") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_no", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("new_text"),
        )
    )
    base = docs.select("doc_id", n_chunks.cast("long").alias("n_chunks"))
    return base.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
    )
