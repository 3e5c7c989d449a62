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
