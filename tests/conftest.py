# -*- coding: utf-8 -*-
"""Shared test fixtures: one SparkSession, one fixture corpus, one
reference golden run per test session."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("rdf-converter-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    from fixtures.generator import build_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    build_corpus(out)
    return out


@pytest.fixture(scope="session")
def golden_outputs(corpus, tmp_path_factory):
    from golden import run_reference

    wrk = str(tmp_path_factory.mktemp("refwork"))
    return run_reference(corpus, wrk)


@pytest.fixture(scope="session")
def routed(spark, corpus):
    from rdf_converter_spark.sources.route import route
    from rdf_converter_spark.sources.web_pages import read_web_pages

    web = read_web_pages(spark, os.path.join(corpus, "web_pages"))
    r = route(web).cache()
    r.count()
    return r


def collect_triples(df):
    """Triple DataFrame -> set of comparator tuples."""
    return {
        (r["subj"], r["pred"], r["obj"], r["obj_is_uri"], r["obj_lang"],
         r["obj_datatype"])
        for r in df.select(
            "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_datatype"
        ).collect()
    }
