# -*- coding: utf-8 -*-
"""Salted skew-join (operators/salt.py::salted_join).

The invariant under test: salting is pure shuffle plumbing — the
result multiset equals the plain join for every supported join type,
including hub keys, unmatched keys, and null-bearing rows.
"""
import pytest
from pyspark.sql import functions as F

from rdf_converter_spark.operators.salt import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hub key carrying 90% of rows + a tail + an unmatched key
    rows = [(i, "hub" if i % 10 else "tail%d" % (i // 10), float(i))
            for i in range(200)]
    rows.append((999, "orphan", 1.0))
    big = spark.createDataFrame(rows, ["id", "k", "v"])
    dim = spark.createDataFrame(
        [("hub", 100), ("tail0", 200), ("tail5", 300), ("lonely", 400)],
        ["k", "w"],
    )
    return big, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_equals_plain_join(skewed):
    big, dim = skewed
    out = salted_join(big, dim, ["k"], num_salts=4)
    assert _rows(out.select("id", "k", "v", "w")) == _rows(
        big.join(dim, "k").select("id", "k", "v", "w")
    )


def test_left_keeps_unmatched_once(skewed):
    big, dim = skewed
    out = salted_join(big, dim, ["k"], num_salts=4, how="left")
    plain = big.join(dim, "k", "left")
    assert _rows(out.select("id", "k", "v", "w")) == _rows(
        plain.select("id", "k", "v", "w")
    )
    # the orphan survives exactly once despite the replicated dim
    assert out.filter(F.col("k") == "orphan").count() == 1


def test_null_key_rows_behave_like_plain_join(spark):
    big = spark.createDataFrame([(1, None, 1.0), (2, "a", 2.0)],
                                ["id", "k", "v"])
    dim = spark.createDataFrame([("a", 10)], ["k", "w"])
    out = salted_join(big, dim, ["k"], num_salts=3, how="left")
    assert _rows(out.select("id", "w")) == [(1, None), (2, 10)]


def test_salt_is_in_the_join_key(skewed):
    big, dim = skewed
    out = salted_join(big, dim, ["k"], num_salts=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan


def test_unsupported_join_type_raises(skewed):
    big, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, dim, ["k"], how="right")


def test_salt_column_dropped(skewed):
    big, dim = skewed
    out = salted_join(big, dim, ["k"], num_salts=4)
    assert "_salt" not in out.columns
