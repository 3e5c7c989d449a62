# -*- coding: utf-8 -*-
"""Phase-split profiling of the volume path at one parallelism level.

Phases per run:
  t_plan   build DataFrame + .explain()  (analysis/optimize/physical,
           driver-side, single-threaded — the serial fraction suspect)
  t_exec   .count()                      (cluster execution)

Layouts: --tasks 0 keeps the scan's natural splits (r01 behavior);
--tasks K repartitions the base corpus to K before replication.
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_corpus  # noqa: E402

REP = int(os.environ.get("EXP_REP", "48"))


def make_spark(n, shuffle):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[%d]" % n)
        .appName("bench-exp2")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main(n_cores, tasks, shuffle, runs):
    from pyspark.sql import functions as F

    from rdf_converter_spark.pipelines.runner import build_triples_extraction
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    corpus = bench_corpus()
    spark = make_spark(n_cores, shuffle)
    try:
        web0 = read_web_pages(spark, corpus)
        n_pages = web0.count() * REP

        def plan():
            web = read_web_pages(spark, corpus)
            if tasks:
                web = web.repartition(tasks)
            rep = spark.range(REP).select(F.col("id").alias("_rep"))
            web = web.crossJoin(rep).withColumn(
                "url",
                F.concat("url", F.lit("?rep="), F.col("_rep").cast("string")),
            ).drop("_rep")
            return build_triples_extraction(spark, route(web))

        # warmup: full plan over a 2*cores-spread slice
        warm = read_web_pages(spark, corpus).repartition(2 * n_cores)
        build_triples_extraction(spark, route(warm)).count()
        spark.catalog.clearCache()

        out = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = plan()
            with redirect_stdout(io.StringIO()):
                df.explain("formatted")
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            out.append({"t_plan": round(t1 - t0, 2),
                        "t_exec": round(t2 - t1, 2),
                        "wall": round(t2 - t0, 2)})
        best = min(r["wall"] for r in out)
        print(json.dumps({
            "cores": n_cores, "tasks": tasks, "shuffle": shuffle,
            "pages": n_pages, "triples": n, "runs": out,
            "pages_per_sec": round(n_pages / best, 1),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("--tasks", type=int, default=0)
    ap.add_argument("--shuffle", type=int, default=64)
    ap.add_argument("--runs", type=int, default=2)
    a = ap.parse_args()
    main(a.level, a.tasks, a.shuffle, a.runs)
