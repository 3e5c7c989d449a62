# -*- coding: utf-8 -*-
"""Golden-triple generation: execute the *actual reference converters*
(/root/reference) on a fixture corpus, under the rdflib/tqdm shim
(tests/refshim), and collect their emitted triples.

The shim's ConjunctiveGraph has set semantics and serializes one JSON
object per triple, so golden files parse directly into
``(s, p, o, o_is_uri, lang, datatype)`` tuple sets — the exact equality
domain of the P/R gate (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Dict, FrozenSet, Set, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MEMAD_REFERENCE_DIR", "/root/reference")
REFSHIM = os.path.join(REPO, "tests", "refshim")

Triple = Tuple[str, str, str, bool, object, object]


def _run(script: str, args, workdir: str) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REFSHIM
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, script)] + args,
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            "%s failed:\nSTDOUT:\n%s\nSTDERR:\n%s"
            % (script, proc.stdout[-4000:], proc.stderr[-4000:])
        )


def run_reference(corpus_dir: str, workdir: str) -> Dict[str, str]:
    """Run LD, PA, Yle converters; returns {output_name: path}.

    Run order matters: PA's subtitle stage reads ``ina_ld_mapping.csv``
    written by the LD run into the shared cwd (pa_converter.py:632,
    documented inter-job dependency).
    """
    os.makedirs(workdir, exist_ok=True)
    mlink = os.path.join(workdir, "mappings")
    if not os.path.exists(mlink):
        os.symlink(os.path.join(REFERENCE, "mappings"), mlink)
    out = os.path.join(workdir, "out") + os.sep
    os.makedirs(out, exist_ok=True)
    flow = os.path.join(corpus_dir, "file_flow_mapping.json")

    _run("ld_converter.py",
         ["-p", os.path.join(corpus_dir, "ld"), "-o", out, "-f", flow],
         workdir)
    _run("pa_converter.py",
         ["-p", os.path.join(corpus_dir, "pa"), "-o", out,
          "-s", os.path.join(corpus_dir, "asr"), "-f", flow, "-k"],
         workdir)
    _run("yle_converter.py",
         ["-p", os.path.join(corpus_dir, "yle"), "-o", out, "-f", flow],
         workdir)

    outputs = {}
    for name in os.listdir(out):
        outputs[name] = os.path.join(out, name)
    return outputs


def load_triples(path: str) -> Set[Triple]:
    triples = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            r = json.loads(line)
            triples.add(
                (r["s"], r["p"], r["o"], r["o_is_uri"], r["lang"], r["datatype"])
            )
    return triples


def golden_triples(outputs: Dict[str, str], prefix: str = "") -> Set[Triple]:
    """Union the triple sets of all golden graphs matching a prefix."""
    acc: Set[Triple] = set()
    for name, path in outputs.items():
        if name.startswith(prefix) and name.endswith(".ttl"):
            acc |= load_triples(path)
    return acc


def precision_recall(mine: Set[Triple], golden: Set[Triple]):
    tp = len(mine & golden)
    precision = tp / len(mine) if mine else 1.0
    recall = tp / len(golden) if golden else 1.0
    return precision, recall


def diff_report(mine: Set[Triple], golden: Set[Triple], limit: int = 12) -> str:
    extra = sorted(mine - golden)[:limit]
    missing = sorted(golden - mine)[:limit]
    lines = ["EXTRA (mine, not golden):"]
    lines += ["  %r" % (t,) for t in extra]
    lines += ["MISSING (golden, not mine):"]
    lines += ["  %r" % (t,) for t in missing]
    return "\n".join(lines)
