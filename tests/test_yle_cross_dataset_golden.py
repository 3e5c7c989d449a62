# -*- coding: utf-8 -*-
"""Cross-dataset yle re-emission vs the EXECUTED reference converter:
a doc present in two yle datasets must yield the same triple set in
BOTH datasets' graphs (yle_converter.py:263-546 re-instantiates the
graph per dataset), and the compat CLI's per-dataset .ttl files must
match those reference graphs exactly (ADVICE r2 item #2)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import golden as G  # noqa: E402
from test_export_canonical import _parse_turtle  # noqa: E402


def test_yle_cross_dataset_matches_reference(spark, tmp_path):
    from fixtures.generator import CorpusBuilder

    b = CorpusBuilder(str(tmp_path / "gen"), seed=13)
    _stem, payload = b._yle_doc(3)
    corpus = tmp_path / "c"
    for ds in ("dsa", "dsb"):
        p = corpus / "yle" / ds / "prog.xml"
        p.parent.mkdir(parents=True)
        p.write_bytes(payload)
    flow = corpus / "file_flow_mapping.json"
    flow.write_text("{}")

    # reference converter under the shim (same harness as golden.py)
    work = tmp_path / "work"
    work.mkdir()
    os.symlink(os.path.join(G.REFERENCE, "mappings"),
               str(work / "mappings"))
    out = str(tmp_path / "gout") + os.sep
    os.makedirs(out, exist_ok=True)
    G._run(
        "yle_converter.py",
        ["-p", str(corpus / "yle"), "-o", out, "-f", str(flow)],
        str(work),
    )
    ga = G.load_triples(out + "yle_dsa.ttl")
    gb = G.load_triples(out + "yle_dsb.ttl")
    assert ga and ga == gb  # the reference re-emits in every dataset

    # compat CLI over the same tree
    sys.path.insert(0, REPO)
    import convert

    mout = str(tmp_path / "mout")
    rc = convert.main([
        "yle", "-p", str(corpus / "yle"), "-o", mout,
        "--master", "local[4]",
    ])
    assert rc == 0
    mine = {}
    for ds in ("dsa", "dsb"):
        with open(os.path.join(mout, "yle_%s.ttl" % ds)) as fh:
            mine[ds] = _parse_turtle(fh.read())
    assert mine["dsa"] == ga, (
        "dsa diff: only-mine=%r only-ref=%r"
        % (sorted(mine["dsa"] - ga)[:3], sorted(ga - mine["dsa"])[:3])
    )
    assert mine["dsb"] == gb
