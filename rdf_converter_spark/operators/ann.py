# -*- coding: utf-8 -*-
"""Similarity search over an embedding column (array<float>).

``brute_force_topk`` is the exact baseline: query x corpus join,
sequential-double cosine via zip_with/aggregate (bit-stable for the
DuckDB oracle), rank window with deterministic tie-break.

``lsh_topk`` is the scale path: random-hyperplane signatures (md5-seed
deterministic pseudo-hyperplanes) bucket the corpus; search touches
only same-bucket candidates — the join fans out per bucket instead of
full cross-product. Probing multiple buckets trades recall/cost.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("v", F.transform(col, lambda x: x.cast("double")))


def _cosine(va, vb):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    return dot / (n(va) * n(vb))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding). Excludes self-matches by id.
    """
    corpus = _as_double(embeddings).select("vec_id", "v")
    q = _as_double(queries).select(
        F.col("query_id"), F.col("v").alias("qv")
    )
    scored = q.crossJoin(corpus).filter(
        F.col("query_id") != F.col("vec_id")
    ).withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def _arrow_cell_assigner(cent_rows, nprobe: int = 1):
    """Batch-matmul cell assignment: one numpy ``V @ C.T`` per Arrow
    batch against the (n_cells x dim) centroid matrix captured in the
    closure — batch-level constant cost instead of the expression
    path's n_cells x dim interpreted ops PER ROW (6.1 s -> sub-second
    at sf0.1). Same ordering semantics as ``best_cell`` and the probe
    window: round(cos, 6) DESC, ties to the lower cell id (stable
    argsort keeps original order and the centroid matrix is sorted by
    cell id ascending).

    ``nprobe == 1`` returns the single best cell (long) — corpus
    assignment; ``nprobe > 1`` returns the nprobe best cells
    (array<long>) — query-side probe selection as ONE narrow
    projection, replacing the r02 crossJoin(centroids) + rank window
    (two exchanges of the query side)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.array([[float(x) for x in r["v"]] for r in cent_rows],
                 dtype=np.float64)
    cells = np.array([int(r["vec_id"]) for r in cent_rows], dtype=np.int64)
    Cn = np.linalg.norm(C, axis=1)

    def _sims(vs):
        V = np.array(vs.tolist(), dtype=np.float64)
        return np.round(
            (V @ C.T) / (np.linalg.norm(V, axis=1)[:, None] * Cn[None, :]),
            6,
        )

    if nprobe == 1:
        @pandas_udf("long")
        def best_cell_arrow(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int64")
            return pd.Series(cells[np.argmax(_sims(vs), axis=1)])

        return best_cell_arrow

    @pandas_udf("array<long>")
    def probe_cells_arrow(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        idx = np.argsort(-_sims(vs), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([cells[row].tolist() for row in idx])

    return probe_cells_arrow


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    n_cells: int = 16, nprobe: int = 2, assignment: str = "arrow",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the second classic ANN
    scale path next to hyperplane LSH.

    Coarse quantizer: the first ``n_cells`` corpus vectors (by vec_id)
    act as centroids — deterministic and reproducible in any engine
    (a k-means fit would be neither), while still data-derived so
    cells follow the corpus distribution. Every corpus vector is
    assigned to its nearest centroid (one broadcast join against
    ``n_cells`` rows + a rank-1 window — no shuffle of the corpus
    beyond the window partitioning); a query probes its ``nprobe``
    nearest cells and scores only those cells' members. Candidate
    volume ~ nprobe/n_cells of the corpus per query.
    """
    corpus = _as_double(embeddings).select("vec_id", "v")
    # the coarse quantizer is a driver-side artifact (a k-means fit
    # would be too): collect the n_cells centroid vectors (tiny) and
    # inline them — cell ASSIGNMENT is then a pure per-row computation,
    # NO shuffle/join of the corpus at all (r02 first cut ranked a
    # crossJoin through a per-vec_id window: one full corpus exchange
    # that a 10^12-vector table cannot afford).
    # The pick tries a PUSHED-DOWN ``vec_id < n_cells`` read first
    # (dense-id corpora: parquet stats prune to one row group instead
    # of the r02 full-scan orderBy); the full-scan top-n only runs as
    # the sparse-id fallback.
    cent_rows = sorted(
        corpus.filter(F.col("vec_id") < n_cells)
        .orderBy("vec_id").limit(n_cells).collect(),
        key=lambda r: r["vec_id"],
    )
    if len(cent_rows) < n_cells:  # sparse vec_ids: generic top-n pick
        cent_rows = sorted(
            corpus.orderBy("vec_id").limit(n_cells).collect(),
            key=lambda r: r["vec_id"],
        )

    cent_arr = F.array(*[
        F.struct(
            F.lit(int(r["vec_id"])).cast("long").alias("cell"),
            F.array(*[F.lit(float(x)) for x in r["v"]]).alias("cv"),
        )
        for r in cent_rows
    ])

    def best_cell(v):
        """argmax over literal centroids of round(cosine, 6), ties to
        the lower cell id — same order as a (csim DESC, cell ASC)
        rank-1 window. A single ``aggregate`` fold: the accumulator is
        a lambda variable, so the tree stays linear in n_cells (a
        chained F.when fold would reference the previous step three
        times and blow up exponentially)."""
        init = F.struct(
            F.lit(-2.0).alias("sim"), F.lit(-1).cast("long").alias("cell")
        )

        def step(acc, c):
            sim = F.round(_cosine(v, c["cv"]), 6)
            better = (sim > acc["sim"]) | (
                (sim == acc["sim"]) & (c["cell"] < acc["cell"])
            )
            return F.when(
                better,
                F.struct(sim.alias("sim"), c["cell"].alias("cell")),
            ).otherwise(acc)

        return F.aggregate(cent_arr, init, step)

    if assignment == "arrow":
        assigned = corpus.select(
            "vec_id", "v",
            _arrow_cell_assigner(cent_rows)(F.col("v")).alias("cell"),
        )
    else:  # "expr": pure-Catalyst fold, kept for plan tests / no-Arrow
        assigned = corpus.select(
            "vec_id", "v", best_cell(F.col("v"))["cell"].alias("cell")
        )
    q = _as_double(queries).select(
        F.col("query_id"), F.col("v").alias("qv")
    )
    if assignment == "arrow":
        # nprobe best cells per query as a narrow projection + explode:
        # NO exchange on the query side
        probes = q.withColumn(
            "cell",
            F.explode(_arrow_cell_assigner(cent_rows, nprobe)(F.col("qv"))),
        ).select("query_id", "qv", "cell")
    else:
        # expr path: rank the query x centroid fan-out through a window
        cents = corpus.sparkSession.createDataFrame(
            [(r["vec_id"], [float(x) for x in r["v"]]) for r in cent_rows],
            "cell long, cv array<double>",
        )
        qsim = F.round(_cosine(F.col("qv"), F.col("cv")), 6)
        w_probe = Window.partitionBy("query_id").orderBy(
            F.col("qsim").desc(), F.col("cell").asc()
        )
        probes = (
            q.crossJoin(F.broadcast(cents))
            .withColumn("qsim", qsim)
            .withColumn("prank", F.row_number().over(w_probe))
            .filter(F.col("prank") <= nprobe)
            .select("query_id", "qv", "cell")
        )
    # queries are the small side: BROADCAST them into the corpus join
    # so the (10^12-row at scale) assigned corpus is never exchanged —
    # the only shuffle in the whole query is the final per-query rank
    # window over the candidate set (~ nprobe/n_cells of the corpus).
    scored = F.broadcast(probes).join(assigned, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    ).withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id",
                F.col("rank").cast("long").alias("rank"), "cosine")
    )


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane: component j of plane p =
    (md5-derived digit) - 7.5, reproducible in any engine."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(F.concat_ws("_", F.lit(plane), j.cast("string"))),
                    1, 1,
                ),
            )
            - 8.5
        ),
    )


def _hyperplane_value(plane: int, j: int) -> float:
    """Component j of pseudo-hyperplane ``plane``: hexdigit of
    md5(f"{plane}_{j}")[0] + 1 - 8.5 (the +1 mirrors SQL's 1-based
    ``instr``). Deterministic, so the engine inlines LITERALS while
    the DuckDB oracle recomputes the same grid with its own md5."""
    import hashlib

    d = int(hashlib.md5(("%d_%d" % (plane, j)).encode()).hexdigest()[0], 16)
    return d + 1 - 8.5


def lsh_signature(df: DataFrame, dim: int, planes: int = 8) -> DataFrame:
    """Sign-of-projection bucket signature per vector.

    The hyperplane grid is a pure function of (plane, j): r01 embedded
    the md5 derivation in the row expression — planes x dim md5 calls
    PER ROW; here the grid is computed once at plan-build time and
    shipped as array literals (bit-identical values)."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    bits = []
    for p in range(planes):
        hyp = F.array(
            *[F.lit(_hyperplane_value(p, j)) for j in range(dim)]
        )
        proj = F.aggregate(
            F.zip_with(v, hyp, lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    planes: int = 6, probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    ``probes > 1`` enables multi-probe: the query additionally searches
    the buckets at Hamming distance 1 (one sign bit flipped), in bit
    order, up to ``probes`` buckets total — the standard recall/cost
    dial (recall rises toward brute force as probes -> planes+1) that
    costs a fan-out on the SMALL query side only; the corpus is still
    touched once per probed bucket via the same equi-join."""
    corpus = lsh_signature(_as_double(embeddings), dim, planes).select(
        "vec_id", "v", "bucket"
    )
    q = lsh_signature(_as_double(queries), dim, planes).select(
        F.col("query_id"), F.col("v").alias("qv"), "bucket"
    )
    if probes > 1:
        flips = F.transform(
            F.sequence(F.lit(1), F.lit(min(probes - 1, planes))),
            lambda b: F.concat(
                F.col("bucket").substr(F.lit(1), b - 1),
                F.when(
                    F.col("bucket").substr(b, F.lit(1)) == "1",
                    F.lit("0"),
                ).otherwise(F.lit("1")),
                F.col("bucket").substr(b + 1, F.lit(planes) - b),
            ),
        )
        q = q.withColumn(
            "bucket",
            F.explode(
                F.concat(F.array(F.col("bucket")), flips)
            ),
        )
    # queries (with their probe fan-out) are the small side: broadcast
    # them so the corpus is never exchanged on bucket — only the final
    # rank window shuffles (candidates only), like ivf_topk
    scored = F.broadcast(q).join(corpus, "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    ).withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def _dot(va, vb):
    """Sequential-double dot product (bit-stable vs DuckDB's
    list_dot_product, same left-to-right fold)."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _arrow_pq_encoder(cbs, sub: int):
    """Arrow batch PQ encoder: per subspace, distances to every
    codeword computed with SEQUENTIAL float64 accumulation (explicit
    per-dimension loop, NOT a BLAS matmul whose blocked summation
    would change the doubles), so every d² is bit-identical to the
    JVM/DuckDB expression twin; argmin on micro-unit integers with
    first-occurrence (= lowest code) tie-break — the same (d, code)
    order the expression path and the oracle use."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m_sub = len(cbs)
    n_codes = len(cbs[0])

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        V = np.array(vs.tolist(), dtype=np.float64)
        n = V.shape[0]
        out = np.empty((n, m_sub), dtype=np.int32)
        for s in range(m_sub):
            Vs = V[:, s * sub:(s + 1) * sub]
            vv = Vs[:, 0] * Vs[:, 0]
            for j in range(1, sub):
                vv = vv + Vs[:, j] * Vs[:, j]
            dints = np.empty((n, n_codes), dtype=np.int64)
            for c in range(n_codes):
                cw = cbs[s][c]
                vc = Vs[:, 0] * cw[0]
                for j in range(1, sub):
                    vc = vc + Vs[:, j] * cw[j]
                cc = cw[0] * cw[0]
                for x in cw[1:]:
                    cc = cc + x * x
                d2 = vv - 2 * vc + cc
                # HALF_UP at 6 decimals (d2 >= 0), matching
                # round(d2, 6) comparisons in Spark SQL / DuckDB
                dints[:, c] = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
            out[:, s] = np.argmin(dints, axis=1)  # first min = low code
        return pd.Series([row.tolist() for row in out])

    return encode


def pq_topk(
    embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    m_sub: int = 8, n_codes: int = 16, encoder: str = "arrow",
) -> DataFrame:
    """Product-quantization approximate top-k (ADC scan) — the third
    classic ANN scale path next to hyperplane LSH and IVF, and the
    one that shrinks STORAGE: each corpus vector is encoded once as
    ``m_sub`` small codes (here one byte each — m_sub bytes instead
    of 4*dim), and query scoring reads ONLY the code table.

    Codebooks are the first ``n_codes`` corpus vectors' subvectors —
    the same deterministic, data-derived pick as ``ivf_topk``'s
    coarse centroids (a k-means fit would not be reproducible across
    engines). Encoding is a pure per-row computation against literal
    codebooks (map-only, NO shuffle of the corpus); the asymmetric
    distance is the sum of per-subspace L2² terms, each computed via
    the dot-product identity |q-c|² = q·q - 2q·c + c·c (the exact
    sequence the DuckDB twin runs), scaled to micro-units and summed
    as INTEGERS so the total is addition-order-free across engines.
    The only exchange in the whole query is the per-query rank
    window. At 10^12 vectors this composes with IVF cells (encode
    per cell, scan only probed cells); here it is exhibited as the
    full-corpus ADC scan that IVFADC runs per cell.
    """
    if dim % m_sub:
        raise ValueError("dim %d not divisible by m_sub %d" % (dim, m_sub))
    sub = dim // m_sub
    corpus = _as_double(embeddings).select("vec_id", "v")
    cb_rows = sorted(
        corpus.filter(F.col("vec_id") < n_codes)
        .orderBy("vec_id").limit(n_codes).collect(),
        key=lambda r: r["vec_id"],
    )
    if len(cb_rows) < n_codes:  # sparse vec_ids: generic top-n pick
        cb_rows = sorted(
            corpus.orderBy("vec_id").limit(n_codes).collect(),
            key=lambda r: r["vec_id"],
        )
    if len(cb_rows) < n_codes:
        raise ValueError(
            "pq_topk: corpus has %d vectors, fewer than n_codes=%d — "
            "shrink n_codes or use brute_topk at this size"
            % (len(cb_rows), n_codes)
        )
    cbs = [
        [[float(x) for x in r["v"][s * sub:(s + 1) * sub]]
         for r in cb_rows]
        for s in range(m_sub)
    ]

    # All distances below are UNROLLED left-associative dot-product
    # chains with the exact summation order of DuckDB's sequential
    # list_dot_product, via the identity |a-c|^2 = a.a - 2 a.c + c.c.
    # The whole encode / distance-table expression is assembled as ONE
    # SQL string and parsed JVM-side by F.expr: composing it from py4j
    # Column objects cost ~18 s of driver-serial plan build (tens of
    # thousands of py4j round trips) before a single task ran.

    def lit_d(x: float) -> str:
        return repr(float(x)) + "D"  # double literal (bare decimals
        #                              parse as DECIMAL in Spark SQL)

    def udot_vv_sql(col: str, s: int) -> str:
        return " + ".join(
            "element_at({c}, {i}) * element_at({c}, {i})".format(
                c=col, i=s * sub + j + 1)
            for j in range(sub)
        )

    def udot_vc_sql(col: str, s: int, cw) -> str:
        return " + ".join(
            "element_at({c}, {i}) * {x}".format(
                c=col, i=s * sub + j + 1, x=lit_d(cw[j]))
            for j in range(sub)
        )

    def cdot(cw) -> float:
        acc = cw[0] * cw[0]
        for x in cw[1:]:
            acc = acc + x * x
        return acc

    def l2_sql(col: str, s: int, cw) -> str:
        return "({vv}) - 2 * ({vc}) + {cc}".format(
            vv=udot_vv_sql(col, s), vc=udot_vc_sql(col, s, cw),
            cc=lit_d(cdot(cw)))

    def code_sql(s: int) -> str:
        """argmin over literal codewords of round(L2², 6), ties to the
        lower code: struct ordering under array_min compares d first,
        then code."""
        entries = ", ".join(
            "named_struct('d', round({d}, 6), 'code', {c})".format(
                d=l2_sql("v", s, cbs[s][c]), c=c)
            for c in range(n_codes)
        )
        return "array_min(array({e}))['code']".format(e=entries)

    if encoder == "arrow":
        codes = corpus.select(
            "vec_id",
            _arrow_pq_encoder(cbs, sub)(F.col("v")).alias("codes"),
        )
    else:  # "expr": pure-Catalyst path, kept for plan tests / no-Arrow
        codes = corpus.select(
            "vec_id",
            F.expr("array(%s)" % ", ".join(
                code_sql(s) for s in range(m_sub))).alias("codes"),
        )
    # per-query ADC distance tables: n_codes micro-unit integers per
    # subspace, computed ONCE per query row (queries are few by
    # contract); the corpus-scale path below is pure element_at
    # lookups + integer adds
    q = _as_double(queries).select("query_id", F.col("v").alias("qv"))
    q = q.select(
        "query_id",
        *[
            F.expr("array(%s)" % ", ".join(
                "cast(round(round({d}, 6) * 1000000e0) as bigint)".format(
                    d=l2_sql("qv", s, cbs[s][c]))
                for c in range(n_codes)
            )).alias("dt%d" % s)
            for s in range(m_sub)
        ],
    )
    scored = codes.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("vec_id")
    )
    parts = None
    for s in range(m_sub):
        ds = F.element_at(
            F.col("dt%d" % s), F.element_at("codes", s + 1) + 1
        )
        parts = ds if parts is None else parts + ds
    scored = scored.withColumn(
        "adist", parts.cast("double") / F.lit(1000000.0)
    ).drop(*["dt%d" % s for s in range(m_sub)])
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id",
                F.col("rank").cast("long").alias("rank"), "adist")
    )
