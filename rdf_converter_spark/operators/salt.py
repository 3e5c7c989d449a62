# -*- coding: utf-8 -*-
"""Skew handling: explicit salting (BASELINE north_rule).

Hub entities (shared channel / vocabulary / agent URIs re-emitted per
source row, cf. ld_converter.py:299-302 at 10^12 scale) concentrate
shuffle keys. Two mitigations compose here:

1. ``salted_dedup`` — two-phase duplicate elimination: a *local*
   pre-dedup inside each input partition (mapPartitions-free: a
   repartition on key+salt then dropDuplicates) bounds any single
   reducer's share of a hot key to 1/num_salts, then a global
   dropDuplicates collapses the <= num_salts survivors per key.
2. ``salted_repartition`` — spread a hot-key frame across
   key x salt buckets before a heavy downstream op.

Note dropDuplicates alone already does map-side partial aggregation;
explicit salting additionally protects the *merge* side when one key's
partials overflow a single reducer (e.g. 10^9 identical channel
triples arriving from 10^5 tasks).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, keys: Sequence[str], num_salts: int = 16,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    salt = (F.rand(seed=7) * num_salts).cast("int")
    out = df.withColumn("_salt", salt)
    cols = [F.col(k) for k in keys] + [F.col("_salt")]
    if num_partitions:
        return out.repartition(num_partitions, *cols)
    return out.repartition(*cols)


def salted_dedup(
    df: DataFrame, keys: Optional[List[str]] = None, num_salts: int = 16,
) -> DataFrame:
    """Duplicate elimination that survives pathological key skew."""
    keys = keys or df.columns
    local = salted_repartition(df, keys, num_salts).dropDuplicates(
        keys + ["_salt"]
    )
    return local.drop("_salt").dropDuplicates(keys)


def salted_join(
    big: DataFrame, dim: DataFrame, on: Sequence[str],
    num_salts: int = 16, how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: hub keys on the big side fan out over
    ``num_salts`` shuffle buckets.

    The big side gets a deterministic per-row salt (hash of the whole
    row — stable across task retries, unlike ``rand``/partition id),
    the dim side is replicated ``num_salts`` times, and the join runs
    on ``key x salt``, so one hub entity's rows land on ``num_salts``
    reducers instead of one. The result is exactly ``big JOIN dim ON
    keys`` — salting never changes which rows match, only where they
    meet.

    When to use which skew tool: a *broadcastable* dim needs no salt
    (no shuffle at all); AQE's skew-join split handles moderate skew
    on sort-merge joins after the fact; explicit salting is for the
    mid-size dim (too big to broadcast) against a fact side whose key
    histogram is power-law — the hub-entity shape of a web-crawl KG.
    Non-key column names must be disjoint between the two sides.
    ``how`` supports inner and left joins (the replicated dim makes
    right/outer duplicates unmatched rows ``num_salts`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left, got %r" % how)
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(num_salts)])),
    )
    return b.join(d, keys + ["_salt"], how).drop("_salt")
