# -*- coding: utf-8 -*-
"""Spot-check oracle parity for selected queries (driver-gate replica).

Usage: python scripts/check_parity.py [--sf DIR] name [name ...]
"""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    a = ap.parse_args()

    import duckdb
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, a.sf, t)
        )
    qs = mod.queries()
    oracles = mod.oracle_sql()
    rc = 0
    for name in a.names:
        df = qs[name](spark, a.sf)
        cols = df.columns
        srows = [tuple(_norm(v) for v in r) for r in df.collect()]
        if name not in oracles:
            print("%s: NO ORACLE (%d spark rows)" % (name, len(srows)))
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = [tuple(_norm(v) for v in r) for r in res.fetchall()]
        if sorted(cols) != sorted(dcols):
            print("%s: COLS MISMATCH %s vs %s" % (name, cols, dcols))
            rc = 1
            continue
        sidx = [cols.index(c) for c in sorted(cols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        s = sorted(tuple(r[i] for i in sidx) for r in srows)
        d = sorted(tuple(r[i] for i in didx) for r in drows)
        if s == d:
            print("%s: OK (%d rows)" % (name, len(s)))
        else:
            rc = 1
            diffs = [(x, y) for x, y in zip(s, d) if x != y][:3]
            print("%s: MISMATCH %d vs %d rows; %s"
                  % (name, len(s), len(d), diffs))
            only_s = [r for r in s if r not in set(d)][:2]
            only_d = [r for r in d if r not in set(s)][:2]
            print("  only-spark:", only_s)
            print("  only-duck :", only_d)
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
