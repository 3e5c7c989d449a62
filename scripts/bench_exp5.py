# -*- coding: utf-8 -*-
"""Hardware-scaling probe WITHOUT Spark: the fused parse kernel over
identical payload batches in N pinned multiprocessing workers.
If this doesn't scale ~4x from 4 -> 16 procs, no Spark-side change
can make the pipeline scale either (memory bandwidth / frequency
droop is the ceiling)."""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _payloads():
    """Representative per-kind payloads from the fixture generator."""
    from fixtures.generator import build_corpus  # noqa: F401  (corpus cached)
    import pyarrow.parquet as pq

    from bench import bench_corpus
    from rdf_converter_spark.sources.web_pages import unwrap_html

    corpus = bench_corpus()
    rows = []
    for f in sorted(os.listdir(corpus))[:8]:
        t = pq.read_table(os.path.join(corpus, f), columns=["url", "html"])
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            rows.append(unwrap_html(html))
    return rows


def _work(args):
    units, reps = args
    from rdf_converter_spark.pipelines import ld as ldp
    from rdf_converter_spark.pipelines import pa as pap
    from rdf_converter_spark.pipelines import yle as ylep
    from rdf_converter_spark.sources.units import parse_csv_units_batched

    n = 0
    for _ in range(reps):
        by_kind = {}
        for doc_type, ds, fn, row, payload in units:
            by_kind.setdefault(doc_type, []).append((ds, fn, row, payload))
        for kind, items in by_kind.items():
            if kind in ("ld_program", "ld_segment", "pa"):
                rows = parse_csv_units_batched([p for _, _, _, p in items])
                derive = {
                    "ld_program": ldp._derive_ld_program,
                    "ld_segment": ldp._derive_ld_segment,
                    "pa": pap._derive_pa,
                }[kind]
                for (ds, fn, r, _), row in zip(items, rows):
                    derive("u", ds, fn, r, row)
                    n += 1
            elif kind == "yle":
                for ds, fn, r, p in items:
                    ylep._derive_yle("u", ds, fn, r, p)
                    n += 1
    return n


def main(procs, reps):
    units = [u for u in _payloads() if u[0] in
             ("ld_program", "ld_segment", "pa", "yle")]
    per = max(1, len(units))
    ctx = mp.get_context("spawn")
    with ctx.Pool(procs) as pool:
        pool.map(_work, [(units[:50], 1)] * procs)  # warm imports
        t0 = time.time()
        counts = pool.map(_work, [(units, reps)] * procs)
        dt = time.time() - t0
    total = sum(counts)
    print({"procs": procs, "docs": total, "secs": round(dt, 2),
           "docs_per_sec": round(total / dt, 1), "per_proc": per})


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, required=True)
    ap.add_argument("--reps", type=int, default=6)
    a = ap.parse_args()
    main(a.procs, a.reps)
