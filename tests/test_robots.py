# -*- coding: utf-8 -*-
"""robots.txt parsing + URL filtering (operators/robots.py): group
selection, longest-match-wins, allow-beats-disallow ties, comments,
CRLF, empty Disallow, missing robots."""

import pytest

from rdf_converter_spark.operators.robots import parse_robots, robots_filter

ROBOTS_A = (
    "# crawler policy\r\n"
    "User-Agent: badbot\r\n"
    "Disallow: /\r\n"
    "\r\n"
    "User-agent: goodbot\n"
    "USER-AGENT: *\n"
    "DISALLOW: /private\n"
    "Allow: /private/ok\n"
    "Disallow:   # empty disallow matches nothing\n"
    "Allow: /private/ok\n"
)
ROBOTS_B = (
    "User-agent: *\n"
    "Disallow: /a\n"
    "Allow: /a\n"  # tie on length: allow wins
)


@pytest.fixture()
def robots(spark):
    return spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        ["host", "robots_txt"],
    )


def _urls(spark, pairs):
    return spark.createDataFrame(pairs, ["doc_id", "url"])


def test_parse_group_selection(robots):
    rules = parse_robots(robots).collect()
    a = {(r.rule_path, r.is_allow) for r in rules if r.host == "a.example"}
    # the badbot group's 'Disallow: /' must NOT leak into '*'
    assert a == {("/private", False), ("/private/ok", True)}
    bad = parse_robots(robots, agent="badbot").collect()
    assert {(r.host, r.rule_path) for r in bad} == {
        ("a.example", "/"),
        # '*' group also applies to any named agent
        ("a.example", "/private"), ("a.example", "/private/ok"),
        ("b.example", "/a"), ("b.example", "/a"),
    }


def test_filter_longest_match_and_default(spark, robots):
    urls = _urls(spark, [
        (1, "http://A.example/private/x"),       # blocked by /private
        (2, "http://a.example/private/ok/x"),    # re-allowed (longer)
        (3, "http://a.example/public"),          # no rule -> allowed
        (4, "http://b.example/a/z"),             # tie -> allow wins
        (5, "http://c.example/anything"),        # no robots -> allowed
        (6, "http://a.example"),                 # empty path -> '/'
    ])
    got = {r.doc_id: (r.allowed, r.rule_path)
           for r in robots_filter(urls, robots).collect()}
    assert got[1] == (False, "/private")
    assert got[2] == (True, "/private/ok")
    assert got[3] == (True, None)
    assert got[4] == (True, "/a")
    assert got[5] == (True, None)
    assert got[6] == (True, None)


def test_named_agent_beats_star_group(spark):
    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: mybot\nDisallow: /only-mybot\n\n"
          "User-agent: *\nDisallow: /star\n")],
        ["host", "robots_txt"],
    )
    urls = _urls(spark, [
        (1, "http://h.example/only-mybot/x"),
        (2, "http://h.example/star/x"),
    ])
    got = {r.doc_id: r.allowed
           for r in robots_filter(urls, robots, agent="mybot").collect()}
    # both groups apply to mybot (named group AND the * group)
    assert got == {1: False, 2: False}
    star = {r.doc_id: r.allowed
            for r in robots_filter(urls, robots).collect()}
    assert star == {1: True, 2: False}
