# -*- coding: utf-8 -*-
"""Second golden corpus (different seed, 4x size): guards against the
primary fixture corpus under-sampling a quirk path."""

import os

from conftest import collect_triples
from golden import diff_report, golden_triples, precision_recall, run_reference


def test_full_pipeline_seed7(spark, tmp_path_factory):
    from fixtures.generator import build_corpus
    from rdf_converter_spark.pipelines.runner import run_pipeline

    corpus = str(tmp_path_factory.mktemp("corpus7"))
    build_corpus(corpus, n_ld=120, n_pa=80, n_yle=40, n_asr=12, seed=7)
    outputs = run_reference(corpus, str(tmp_path_factory.mktemp("work7")))
    golden = golden_triples(outputs)

    out = run_pipeline(
        spark, os.path.join(corpus, "web_pages"),
        str(tmp_path_factory.mktemp("run7")), resume=False,
    )
    mine = collect_triples(out["triples"])
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )
