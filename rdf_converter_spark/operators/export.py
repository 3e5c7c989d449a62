# -*- coding: utf-8 -*-
"""Fixture-only Turtle export (S6).

Production output stays relational (the partitioned triple table); TTL
serialization exists for golden-fixture comparison and small graph
handoffs, mirroring ld_converter.py:95-96. The formatter is
deterministic: triples sorted by (subj, pred, obj), N-Triples-style
one statement per line with language tags and datatypes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def format_triple(subj, pred, obj, obj_is_uri, lang, datatype) -> str:
    if obj_is_uri:
        o = "<%s>" % obj
    else:
        o = '"%s"' % _escape(obj)
        if lang:
            o += "@%s" % lang
        elif datatype:
            o += "^^<%s>" % datatype
    return "<%s> <%s> %s ." % (subj, pred, o)


def to_turtle(triples: DataFrame, path: str) -> int:
    """Collect (small graphs only) and write deterministic TTL/NT."""
    rows = triples.select(
        "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_datatype"
    ).collect()
    lines = sorted(
        format_triple(r["subj"], r["pred"], r["obj"], r["obj_is_uri"],
                      r["obj_lang"], r["obj_datatype"])
        for r in rows
    )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)


def to_turtle_distributed(triples: DataFrame, path: str) -> None:
    """Scale path: one sorted text part per partition (for handoff to
    tools that stream N-Triples); no driver materialization."""
    from pyspark.sql import functions as F

    lines = triples.select(
        F.concat(
            F.lit("<"), "subj", F.lit("> <"), "pred", F.lit("> "),
            F.when(F.col("obj_is_uri"),
                   F.concat(F.lit("<"), "obj", F.lit(">")))
            .otherwise(
                F.concat(
                    F.lit('"'),
                    F.regexp_replace(
                        F.regexp_replace("obj", r"\\", r"\\\\"),
                        '"', '\\\\"'
                    ),
                    F.lit('"'),
                    F.when(F.col("obj_lang").isNotNull(),
                           F.concat(F.lit("@"), "obj_lang"))
                    .when(F.col("obj_datatype").isNotNull(),
                          F.concat(F.lit("^^<"), "obj_datatype", F.lit(">")))
                    .otherwise(F.lit("")),
                )
            ),
            F.lit(" ."),
        ).alias("value")
    )
    lines.sortWithinPartitions("value").write.mode("overwrite").text(path)
