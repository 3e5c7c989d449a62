# -*- coding: utf-8 -*-
"""Micro-benchmark: per-task fixed cost of mapInPandas vs JVM-only, and
eager-cache vs cache-race variants of the volume path.

Modes:
  pyoverhead --level N         trivial mapInPandas over K partitions,
                               K in {8, 64, 256} — slope = per-task cost
  variant --level N --tasks K  volume path with (a) lazy persist
                               (r01), (b) eager persist, (c) no persist
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_corpus  # noqa: E402

REP = int(os.environ.get("EXP_REP", "48"))


def make_spark(n):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[%d]" % n)
        .appName("bench-exp3")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def pyoverhead(n_cores):
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    spark = make_spark(n_cores)

    def ident(batches):
        for pdf in batches:
            yield pdf

    try:
        out = {}
        for parts in (8, 64, 256):
            df = spark.range(parts * 100, numPartitions=parts)
            df.mapInPandas(ident, "id long").count()  # warm
            t0 = time.time()
            for _ in range(3):
                df.mapInPandas(ident, "id long").count()
            out[parts] = round((time.time() - t0) / 3, 3)
        # JVM-only control
        jvm = {}
        for parts in (8, 256):
            df = spark.range(parts * 100, numPartitions=parts)
            df.count()
            t0 = time.time()
            for _ in range(3):
                df.count()
            jvm[parts] = round((time.time() - t0) / 3, 3)
        print(json.dumps({"cores": n_cores, "mapInPandas": out, "jvm": jvm}))
    finally:
        spark.stop()


def variant(n_cores, tasks, mode):
    from pyspark.sql import functions as F

    from rdf_converter_spark.pipelines import ld as ldp
    from rdf_converter_spark.pipelines import pa as pap
    from rdf_converter_spark.pipelines import yle as ylep
    from rdf_converter_spark.operators.emit import dedup_triples
    from rdf_converter_spark.pipelines.runner import build_triples_extraction
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    corpus = bench_corpus()
    spark = make_spark(n_cores)

    def volume(routed, persist_mode):
        if persist_mode == "none":
            pass
        else:
            routed = routed.persist()
            if persist_mode == "eager":
                routed.count()
        programs = ldp.parse_ld_programs(routed)
        pa = pap.with_heure2(pap.parse_pa(routed))
        pa = pa.withColumn("parent_heure2", F.lit(None).cast("string"))
        pa = (
            pa.withColumn("t_start", F.lit(None).cast("string"))
            .withColumn("t_end", F.lit(None).cast("string"))
            .withColumn(
                "pubevent_start_lex",
                F.when(~F.col("is_segment"),
                       pap._pa_pubevent_datetime(F.col("broadcast_date"),
                                                 F.col("heure2"))),
            )
        )
        yle = ylep.parse_yle(routed)
        acc = ldp.ld_program_triples(programs)
        for p in (pap.pa_triples(pa), ylep.yle_triples(yle)):
            acc = acc.unionByName(p, allowMissingColumns=True)
        return dedup_triples(acc)

    try:
        web0 = read_web_pages(spark, corpus)
        n_pages = web0.count() * REP

        def build():
            web = read_web_pages(spark, corpus)
            if tasks:
                web = web.repartition(tasks)
            rep = spark.range(REP).select(F.col("id").alias("_rep"))
            web = web.crossJoin(rep).withColumn(
                "url",
                F.concat("url", F.lit("?rep="), F.col("_rep").cast("string")),
            ).drop("_rep")
            return route(web)

        warm = read_web_pages(spark, corpus).repartition(2 * n_cores)
        build_triples_extraction(spark, route(warm)).count()
        spark.catalog.clearCache()

        walls = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            n = volume(build(), mode).count()
            walls.append(round(time.time() - t0, 2))
        best = min(walls)
        print(json.dumps({
            "cores": n_cores, "tasks": tasks, "mode": mode,
            "pages": n_pages, "triples": n, "walls": walls,
            "pages_per_sec": round(n_pages / best, 1),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["pyoverhead", "variant"])
    ap.add_argument("--level", type=int, required=True)
    ap.add_argument("--tasks", type=int, default=64)
    ap.add_argument("--mode", default="lazy",
                    choices=["lazy", "eager", "none"])
    a = ap.parse_args()
    if a.cmd == "pyoverhead":
        pyoverhead(a.level)
    else:
        variant(a.level, a.tasks, a.mode)
