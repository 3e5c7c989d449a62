# -*- coding: utf-8 -*-
"""Self-check of the driver contract: every queries() entry runs, and
every oracle_sql() twin produces identical (sorted, rounded) results
via DuckDB on the same parquet — the same comparison the driver's
correctness gate performs at sf=0.01.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, sf_dir, t)
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(recs):
    # null-safe sort key: None must order stably against any value
    # (rollup-style subtotal rows carry NULL group keys)
    return sorted(
        (tuple(_norm(v) for v in r) for r in recs),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _entry_module():
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_datatype"
    ]


def test_all_queries_run_and_match_oracles(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)

    con = _duck(SF_DIR)
    failures = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        cols = df.columns
        spark_rows = _rows([tuple(r) for r in df.collect()])
        assert len(spark_rows) >= 0  # ran
        if name not in oracles:
            continue
        res = con.execute(oracles[name])
        duck_cols = [d[0] for d in res.description]
        duck_rows = _rows(res.fetchall())
        if sorted(cols) != sorted(duck_cols):
            failures.append("%s: columns %s vs %s" % (name, cols, duck_cols))
            continue
        # align column order by name (driver sorts columns by name)
        sidx = [cols.index(c) for c in sorted(cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_sorted = sorted(
            tuple(r[i] for i in sidx) for r in spark_rows
        )
        d_sorted = sorted(
            tuple(r[i] for i in didx) for r in duck_rows
        )
        if s_sorted != d_sorted:
            diff = [
                (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
            ][:3]
            failures.append(
                "%s: %d vs %d rows; first diffs %s"
                % (name, len(s_sorted), len(d_sorted), diff)
            )
    assert not failures, "\n".join(failures)


def test_multimodal_codec_stub(spark):
    """The real-codec path must raise NotImplementedError (stub), the
    fake path must produce stable Arrow-batched features."""
    from rdf_converter_spark.operators.multimodal import (
        documents_as_media, media_features,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    media = documents_as_media(docs.limit(5))
    feats = media_features(media).collect()
    assert all(len(r["feat"]) == 8 for r in feats)
    with pytest.raises(Exception) as exc:
        media_features(media, use_codec=True).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )
