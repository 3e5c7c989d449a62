# -*- coding: utf-8 -*-
"""End-to-end Yle correctness: engine triples == reference triples."""

from conftest import collect_triples
from golden import diff_report, golden_triples, precision_recall


def test_yle_triples_match_reference(spark, routed, golden_outputs):
    from rdf_converter_spark.operators.emit import dedup_triples
    from rdf_converter_spark.pipelines import yle as ylep
    from rdf_converter_spark.pipelines.vocab import yle_vocab

    docs = ylep.parse_yle(routed)
    triples = ylep.yle_triples(docs).unionByName(yle_vocab(spark, "yle"))
    mine = collect_triples(dedup_triples(triples))
    golden = golden_triples(
        {k: v for k, v in golden_outputs.items()
         if k.startswith("yle_") and "flow" not in k}
    )
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )
