# -*- coding: utf-8 -*-
"""Full-pipeline runner: end-to-end equality with ALL golden graphs,
resume-from-checkpoint identity, lineage/metrics presence."""

import json
import os
import shutil

from conftest import collect_triples
from golden import diff_report, golden_triples, precision_recall


def test_full_pipeline_and_resume(spark, corpus, golden_outputs, tmp_path_factory):
    from rdf_converter_spark.pipelines.runner import run_pipeline

    work = str(tmp_path_factory.mktemp("runner_work"))
    out = run_pipeline(spark, os.path.join(corpus, "web_pages"), work)
    mine = collect_triples(out["triples"])

    golden = golden_triples(golden_outputs)  # union of every graph
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )

    # metrics + per-partition lineage written
    metrics = json.load(open(os.path.join(work, "_metrics.json")))
    stages = {m["stage"] for m in metrics}
    assert {"routed", "triples", "lineage_ld"} <= stages
    assert all(m["rows"] >= 0 for m in metrics)
    assert os.path.exists(os.path.join(work, "_lineage", "triples.json"))

    # simulate a crash after the parse stages: delete downstream
    # outputs, rerun, assert identical final table and that upstream
    # stages were resumed (not recomputed)
    shutil.rmtree(os.path.join(work, "triples"))
    out2 = run_pipeline(spark, os.path.join(corpus, "web_pages"), work)
    mine2 = collect_triples(out2["triples"])
    assert mine2 == mine
    metrics2 = json.load(open(os.path.join(work, "_metrics.json")))
    resumed = {m["stage"] for m in metrics2 if m["resumed"]}
    assert "routed" in resumed and "parsed_pa" in resumed
    recomputed = {m["stage"] for m in metrics2 if not m["resumed"]}
    assert recomputed == {"triples"}


def test_inmem_fused_equals_staged(spark, corpus, golden_outputs):
    """The fused single-pass parse (build_triples_inmem, the bench /
    streaming shape) must emit exactly the golden triple set — same
    gate as the staged runner."""
    from rdf_converter_spark.pipelines.runner import build_triples_inmem
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    routed = route(read_web_pages(spark, os.path.join(corpus, "web_pages")))
    mine = collect_triples(build_triples_inmem(spark, routed))
    golden = golden_triples(golden_outputs)
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )


def test_lineage_footer_reads_are_not_on_the_driver(spark, tmp_path,
                                                    monkeypatch):
    """_record must read parquet footers on the EXECUTORS: driver-side
    pyarrow calls must stay at ZERO however many files a stage writes
    (the r02 sequential driver loop became the stall at millions of
    files). Python workers are separate processes, so patching the
    driver's pyarrow proves where the reads run. Also pins the ADVICE
    r02 lineage semantics: partition_id == write-task id, partitions
    metric == distinct tasks (not files) under partition_by."""
    import pyarrow.parquet as pq

    from rdf_converter_spark.plans.checkpoint import StageRunner

    calls = []
    orig = pq.ParquetFile

    def spy(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(pq, "ParquetFile", spy)

    runner = StageRunner(spark, str(tmp_path / "work"), resume=False)
    from pyspark.sql import functions as F

    df = runner.stage(
        "st",
        lambda: spark.range(100).repartition(4).withColumn(
            "g", (F.col("id") % 2).cast("string")
        ),
        partition_by=["g"],
    )
    assert df.count() == 100
    assert calls == []  # zero driver-side footer reads

    lineage = [
        json.loads(line)
        for line in open(
            os.path.join(str(tmp_path / "work"), "_lineage", "st.json")
        )
    ]
    assert sum(p["rows"] for p in lineage) == 100
    # 4 write tasks x 2 partition values -> more files than tasks
    tasks = {p["partition_id"] for p in lineage}
    assert all(t >= 0 for t in tasks)
    m = runner.metrics[-1]
    assert m["partitions"] == len(tasks)
    assert m["files"] == len(lineage)
    assert m["files"] > m["partitions"]


def test_iceberg_stage_runner_snapshot_resume(spark, tmp_path):
    """Iceberg-backed checkpoints (the north-rule letter): stage ->
    table + snapshot id in metrics, resume reads the snapshot back.
    SKIPPED unless iceberg-spark-runtime is on the classpath — it is
    not bundled in this sandbox (recorded in BENCH.md); the code path
    ships regardless and fails fast when the jar is absent."""
    import pytest

    from rdf_converter_spark.plans.checkpoint import (
        StageRunner, iceberg_available,
    )

    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            StageRunner(spark, str(tmp_path / "w"), fmt="iceberg")
        pytest.skip("iceberg runtime jar not on classpath in sandbox")

    runner = StageRunner(spark, str(tmp_path / "w"), fmt="iceberg")
    df = runner.stage("st", lambda: spark.range(10))
    assert df.count() == 10
    assert runner.metrics[-1]["snapshot_id"] is not None
    runner2 = StageRunner(spark, str(tmp_path / "w"), fmt="iceberg")
    df2 = runner2.stage("st", lambda: spark.range(99))
    assert df2.count() == 10  # resumed, not recomputed
    assert runner2.metrics[-1]["resumed"]


def test_resumed_stage_reuses_lineage_without_rewrite(spark, tmp_path):
    """ADVICE r03: a resumed stage must not launch a footer-read job
    or rewrite its lineage JSON — the original run's rows are reused
    byte-identically (mtime unchanged), and the metrics entry carries
    the same totals with seconds=0/resumed=True."""
    import json
    import os

    from rdf_converter_spark.plans.checkpoint import StageRunner

    work = str(tmp_path / "w")
    r1 = StageRunner(spark, work)
    r1.stage("st", lambda: spark.range(50).repartition(4))
    lpath = os.path.join(work, "_lineage", "st.json")
    stat1 = os.stat(lpath)

    r2 = StageRunner(spark, work)
    r2.stage("st", lambda: spark.range(1))
    stat2 = os.stat(lpath)
    assert (stat1.st_mtime_ns, stat1.st_size) == \
        (stat2.st_mtime_ns, stat2.st_size)
    m = r2.metrics[-1]
    assert m["resumed"] and m["seconds"] == 0.0
    assert m["rows"] == 50
    with open(lpath) as fh:
        per_part = [json.loads(ln) for ln in fh if ln.strip()]
    assert m["files"] == len(per_part)
    assert m["partitions"] == len({p["partition_id"] for p in per_part})
