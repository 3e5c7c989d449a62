# -*- coding: utf-8 -*-
"""Event-log-instrumented single run of the volume path: prints each
stage's (submit->complete wall, task count, name) to find the serial
fraction at high core counts."""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_corpus  # noqa: E402

REP = int(os.environ.get("EXP_REP", "48"))


def main(n_cores, tasks):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rdf_converter_spark.pipelines.runner import build_triples_extraction
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    evdir = "/tmp/spark-events-exp4"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(evdir + "/*"):
        os.remove(f)
    spark = (
        SparkSession.builder.master("local[%d]" % n_cores)
        .appName("bench-exp4")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "file://" + evdir)
        .getOrCreate()
    )
    try:
        web = read_web_pages(spark, corpus := bench_corpus())
        if tasks:
            web = web.repartition(tasks)
        rep = spark.range(REP).select(F.col("id").alias("_rep"))
        web = web.crossJoin(rep).withColumn(
            "url", F.concat("url", F.lit("?rep="), F.col("_rep").cast("string"))
        ).drop("_rep")

        warm = read_web_pages(spark, corpus).repartition(2 * n_cores)
        build_triples_extraction(spark, route(warm)).count()
        spark.catalog.clearCache()

        t0 = time.time()
        build_triples_extraction(spark, route(web)).count()
        wall = time.time() - t0
        print("TIMED_WALL %.2f" % wall)
    finally:
        spark.stop()

    # parse the event log: stages started after the timed window began
    stages = {}
    t0_ms = int(t0 * 1000)
    for path in glob.glob(evdir + "/*"):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time", 0)
                    if sub < t0_ms:
                        continue
                    stages[si["Stage ID"]] = (
                        round((si["Completion Time"] - sub) / 1000.0, 2),
                        si["Number of Tasks"],
                        si["Stage Name"].split("\n")[0][:60],
                    )
    total = 0.0
    for sid in sorted(stages):
        w, n, name = stages[sid]
        total += w
        print("stage %3d  %7.2fs  %4d tasks  %s" % (sid, w, n, name))
    print("SUM_STAGE_WALL %.2f (timed %.2f)" % (total, wall))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("--tasks", type=int, default=0)
    a = ap.parse_args()
    main(a.level, a.tasks)
