# -*- coding: utf-8 -*-
"""Deployment (spark-submit --py-files) and streaming-incremental
pipeline tests."""

import glob
import json
import os
import shutil
import subprocess
import sys


def test_spark_submit_py_files(corpus, tmp_path):
    """The packaged job must run under a real spark-submit with the
    package shipped via --py-files (BASELINE north_star)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import package

    zip_path = package.build(str(tmp_path / "rdf_converter_spark.zip"))
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"

    # shapes file: one conformant shape (every PublicationChannel has
    # exactly one channel id) and one deliberately violated one
    # (max_count 0 on the same path) so the report is non-empty and
    # both outcomes are covered by a single submit.
    eb = "http://www.ebu.ch/metadata/ontologies/ebucore/ebucore#"
    shapes = [
        {"shape": "ChannelShape", "target_class": eb + "PublicationChannel",
         "property": [{"path": eb + "publicationChannelId",
                       "min_count": 1, "max_count": 1}]},
        {"shape": "NoChannelIdShape",
         "target_class": eb + "PublicationChannel",
         "property": [{"path": eb + "publicationChannelId",
                       "max_count": 0}]},
    ]
    shapes_path = str(tmp_path / "shapes.json")
    with open(shapes_path, "w") as fh:
        json.dump(shapes, fh)

    work = str(tmp_path / "work")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(repo, "job.py"),
            "--input", os.path.join(corpus, "web_pages"),
            "--work", work,
            "--entail",
            "--validate", shapes_path,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # anywhere: package must be self-contained
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    def stdout_int(prefix):
        lines = [l for l in proc.stdout.splitlines()
                 if l.startswith(prefix + "=")]
        assert lines, (prefix, proc.stdout[-2000:])
        return int(lines[0].split("=")[1])

    n_triples = stdout_int("TRIPLES")
    assert n_triples > 1000
    assert os.path.exists(os.path.join(work, "triples", "_SUCCESS"))
    n_entailed = stdout_int("ENTAILED_TRIPLES")
    n_viol = stdout_int("SHACL_VIOLATIONS")
    assert n_viol > 0
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    if spark is not None:
        tr = spark.read.parquet(os.path.join(work, "triples"))
        # closure is a superset of the (graph-collapsed) input set
        distinct_spo = tr.select("subj", "pred", "obj").distinct().count()
        assert n_entailed >= distinct_spo
        rep = spark.read.parquet(os.path.join(work, "shacl_report"))
        assert rep.filter(rep.shape == "ChannelShape").count() == 0
        assert rep.filter(rep.shape == "NoChannelIdShape").count() == n_viol
    else:
        assert n_entailed > 1000


def test_streaming_incremental(spark, corpus, tmp_path):
    """Two micro-batches of newly-arrived pages -> appended triples,
    exactly-once per input file via the stream checkpoint."""
    from rdf_converter_spark.streaming.incremental import stream_triples

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    parts = sorted(glob.glob(os.path.join(corpus, "web_pages", "*.parquet")))
    assert parts
    shutil.copy(parts[0], src)

    out = str(tmp_path / "stream_out")
    q = stream_triples(spark, src, out, trigger_once=True)
    q.awaitTermination(300)
    sink = os.path.join(out, "triples_stream")
    n1 = spark.read.parquet(sink).count()
    assert n1 > 1000

    # batch 2: the same file again must NOT reprocess (checkpoint);
    # a genuinely new file must
    shutil.copy(parts[0], os.path.join(src, "again.parquet"))
    q = stream_triples(spark, src, out, trigger_once=True)
    q.awaitTermination(300)
    n2 = spark.read.parquet(sink).count()
    assert n2 > n1  # new file processed
    # same content twice -> extraction emits the same distinct set per
    # batch, so batch2 appended at most n1 rows
    assert n2 <= 2 * n1


def test_salted_repartition_balances_hub_key(spark):
    """Skew guard (SURVEY §5.6): one key holding 50% of rows must not
    land in one partition after salting."""
    from pyspark.sql import functions as F

    from rdf_converter_spark.operators.salt import salted_repartition

    rows = [("hub",)] * 5000 + [("k%d" % i,) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string")
    out = salted_repartition(df, ["k"], num_salts=16, num_partitions=16)
    sizes = [
        r["count"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .count().collect()
    ]
    assert len(sizes) > 4
    assert max(sizes) < 0.25 * sum(sizes), sizes


def test_streaming_upsert_store(spark, corpus, tmp_path):
    """Maintained-store streaming: a re-delivered (re-crawled,
    unchanged) page batch must leave the bucketed triple store
    IDENTICAL (upsert replaces each (subj, pred) group with the same
    content) — not grow it like the append sink; and the final store
    must equal the batch extraction's distinct triple set."""
    from pyspark.sql import functions as F

    from rdf_converter_spark.pipelines.runner import build_triples_extraction
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.streaming.incremental import (
        stream_triples_upsert,
    )

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    parts = sorted(glob.glob(os.path.join(corpus, "web_pages", "*.parquet")))
    shutil.copy(parts[0], src)

    out = str(tmp_path / "store_out")
    store = os.path.join(out, "triples_store")
    q = stream_triples_upsert(spark, src, out)
    q.awaitTermination(300)
    # batch triple set over the same pages == the maintained store
    batch = build_triples_extraction(
        spark, route(spark.read.parquet(os.path.join(src, "*.parquet")))
    ).dropDuplicates()
    cols = [c for c in batch.columns]
    # materialize NOW: the second stream run below replaces the
    # store's files and a lazy plan over them would fail to re-read
    rows1 = sorted(
        map(tuple, spark.read.parquet(store).select(cols).collect())
    )
    n1 = len(rows1)
    assert n1 > 1000
    assert rows1 == sorted(map(tuple, batch.collect()))

    # re-delivery: same content under a new name -> store unchanged
    shutil.copy(parts[0], os.path.join(src, "recrawl.parquet"))
    q = stream_triples_upsert(spark, src, out)
    q.awaitTermination(300)
    rows2 = sorted(
        map(tuple, spark.read.parquet(store).select(cols).collect())
    )
    assert len(rows2) == n1
    assert rows2 == rows1
