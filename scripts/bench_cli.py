#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""One-shot end-to-end bench of the reference-compatible CLI
(convert.py all over a raw reference-layout tree): the path an actual
rdf-converter user migrates through. Prints one JSON line; record the
result as a row in BENCH.md.

Usage: python scripts/bench_cli.py [--ld 3000] [--master 'local[32]']
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ld", type=int, default=3000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from fixtures.generator import build_corpus

    base = os.path.join(REPO, ".bench", "cli_corpus_ld%d" % args.ld)
    if not os.path.isdir(os.path.join(base, "ld")):
        build_corpus(
            base,
            n_ld=args.ld,
            n_pa=max(10, int(args.ld * 0.75)),
            n_yle=max(5, args.ld // 5),
            n_asr=max(3, args.ld // 20),
        )
    # logical documents (programs/pages), not raw files — LD/PA
    # datasets pack many rows per CSV; the web_pages twin the
    # generator writes alongside the raw layout has one row per doc
    wp = os.path.join(base, "web_pages")
    if os.path.isdir(wp):
        import duckdb

        n_docs = duckdb.sql(
            "SELECT count(*) FROM parquet_scan('%s/*.parquet')" % wp
        ).fetchone()[0]
    else:
        n_docs = sum(
            len(files)
            for kind in ("ld", "pa", "yle", "asr")
            for _, _, files in os.walk(os.path.join(base, kind))
        )

    out = tempfile.mkdtemp(prefix="cli_bench_")
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "convert.py"), "all",
            "-p", base, "-o", out,
            "-f", os.path.join(base, "file_flow_mapping.json"),
            "-k", "--master", args.master,
        ],
        capture_output=True, text=True, timeout=3600,
    )
    secs = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        return 1
    n_triples = 0
    for line in proc.stdout.splitlines():
        if line.startswith("saved ") and "triples" in line:
            n_triples += int(line.rsplit("(", 1)[1].split()[0])
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({
        "surface": "convert.py all (raw reference layout -> TTL files)",
        "docs": n_docs,
        "triples_written": n_triples,
        "seconds": round(secs, 1),
        "docs_per_sec": round(n_docs / secs, 1),
        "triples_per_sec": round(n_triples / secs, 1),
        "master": args.master,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
