# -*- coding: utf-8 -*-
"""End-to-end PA correctness: engine triples == reference triples."""

from conftest import collect_triples
from golden import diff_report, golden_triples, precision_recall


def test_pa_triples_match_reference(spark, routed, golden_outputs):
    from rdf_converter_spark.operators.emit import dedup_triples
    from rdf_converter_spark.pipelines import pa as pap
    from rdf_converter_spark.pipelines.vocab import ina_vocab

    pa = pap.parse_pa(routed)
    pa_full = pap.pa_with_segment_times(pap.with_heure2(pa))
    triples = pap.pa_triples(pa_full).unionByName(ina_vocab(spark, "pa"))
    mine = collect_triples(dedup_triples(triples))
    golden = golden_triples(
        {k: v for k, v in golden_outputs.items() if k == "pa.ttl"}
    )
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )
