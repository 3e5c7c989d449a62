# -*- coding: utf-8 -*-
"""As-of (point-in-time) join — for each left row, the LATEST right
row of the same key with ``ts_right <= ts_left``.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive
translation is a range join that explodes to O(|L| * |R|) per key.
This implementation is the scalable union+window form instead:

  1. tag left rows 1, right rows 0, union them (no join!);
  2. one window per key ordered by (ts, tag): ``last(right_payload,
     ignorenulls=True)`` carries the most recent right payload
     forward — right sorts BEFORE left at equal ts, giving the
     inclusive ``>=`` semantics of DuckDB's ASOF JOIN;
  3. keep the left rows.

Cost: ONE hash exchange + per-key sort over |L| + |R| rows — the same
shuffle a plain equi-join would pay, with no range-explosion. Skewed
keys fall under AQE like any window; at 10^12 rows the window state
is one carried struct per task, O(1) memory.

Right rows must be unique per (key, ts) — equal-timestamp duplicates
have no deterministic ASOF winner in any engine; pre-aggregate (e.g.
``max_by``) before calling, as ``q_asof_join`` does.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    values: Sequence[str] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right
    (ts, *values) at-or-before its timestamp (nulls when none)."""
    values = list(values)
    payload = F.struct(
        F.col(ts).alias("_ts"), *[F.col(c).alias(c) for c in values]
    )
    # a NULL-ts right row can never satisfy ts_left >= ts_right, but
    # NULLS FIRST ordering would place it before every left row and
    # its (non-null) payload struct would be carried as a bogus match
    r = right.filter(F.col(ts).isNotNull()).select(
        F.col(key), F.col(ts), payload.alias("_r"), F.lit(0).alias("_tag")
    )
    l_cols = left.columns
    l = left.withColumn("_tag", F.lit(1))
    both = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    out = both.withColumn("_carry", carried).filter(F.col("_tag") == 1)
    return out.select(
        *l_cols,
        F.col("_carry._ts").alias(ts + suffix),
        *[F.col("_carry." + c).alias(c + suffix) for c in values],
    )
