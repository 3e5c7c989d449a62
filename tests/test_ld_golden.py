# -*- coding: utf-8 -*-
"""End-to-end LD correctness: engine triples == reference triples."""

from conftest import collect_triples
from golden import diff_report, golden_triples, precision_recall


def _ld_engine_triples(spark, routed):
    from rdf_converter_spark.operators.emit import dedup_triples
    from rdf_converter_spark.pipelines import ld as ldp
    from rdf_converter_spark.pipelines.vocab import ina_vocab

    programs = ldp.parse_ld_programs(routed)
    segments = ldp.parse_ld_segments(routed)
    prog_triples = ldp.ld_program_triples(programs)
    seg_with_times = ldp.ld_segments_with_times(segments, programs)
    seg_triples = ldp.ld_segment_triples(seg_with_times)
    vocab = ina_vocab(spark, "ld")
    all_t = prog_triples.unionByName(vocab).unionByName(seg_triples)
    return dedup_triples(all_t)


def test_ld_triples_match_reference(spark, routed, golden_outputs):
    mine = collect_triples(_ld_engine_triples(spark, routed))
    golden = golden_triples(
        {k: v for k, v in golden_outputs.items()
         if k in ("ld.ttl", "ld_sujets.ttl")}
    )
    p, r = precision_recall(mine, golden)
    assert p == 1.0 and r == 1.0, (
        "P=%.4f R=%.4f\n%s" % (p, r, diff_report(mine, golden))
    )
