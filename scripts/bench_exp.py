# -*- coding: utf-8 -*-
"""Scaling-bench experiment: one parallelism level, fixed task layout.

Differences vs bench.py r01:
  * the replicated corpus is repartitioned to a FIXED partition count
    (128) before the crossJoin, so the parse stage runs many balanced
    tasks at every level instead of exactly-one-wave-of-cores tasks;
  * shuffle partitions fixed (64) at both levels -> identical plan;
  * warmup repartitions to 2*cores so ALL python workers + codegen
    paths start outside the timed window;
  * prints BOTH timed runs to expose within-process variance.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_corpus  # noqa: E402

TASKS = int(os.environ.get("EXP_TASKS", "128"))
SHUFFLE = int(os.environ.get("EXP_SHUFFLE", "64"))
REP = int(os.environ.get("EXP_REP", "48"))


def make_spark(n):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[%d]" % n)
        .appName("bench-exp")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(n_cores: int, runs: int = 2):
    from pyspark.sql import functions as F

    from rdf_converter_spark.pipelines.runner import build_triples_extraction
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    corpus = bench_corpus()
    spark = make_spark(n_cores)
    try:
        web = read_web_pages(spark, corpus)
        n_pages = web.count()
        rep = spark.range(REP).select(F.col("id").alias("_rep"))
        web = (
            web.repartition(TASKS)
            .crossJoin(rep)
            .withColumn(
                "url",
                F.concat("url", F.lit("?rep="), F.col("_rep").cast("string")),
            )
            .drop("_rep")
        )
        n_pages *= REP

        # warmup: full operator plan over a slice spread to 2*cores so
        # every python worker, codegen path and shuffle writer starts
        warm = read_web_pages(spark, corpus).repartition(2 * n_cores)
        build_triples_extraction(spark, route(warm)).count()
        spark.catalog.clearCache()

        walls = []
        n_triples = 0
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            triples = build_triples_extraction(spark, route(web))
            n_triples = triples.count()
            walls.append(round(time.time() - t0, 2))
        best = min(walls)
        print(json.dumps({
            "cores": n_cores,
            "pages": n_pages,
            "distinct_triples": n_triples,
            "walls": walls,
            "seconds": best,
            "pages_per_sec": round(n_pages / best, 1),
            "triples_per_sec": round(n_triples / best, 1),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("--runs", type=int, default=2)
    a = ap.parse_args()
    main(a.level, a.runs)
