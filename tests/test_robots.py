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
        # RFC 9309 §2.2.1: a.example HAS a badbot group, so only that
        # group applies ('*' rules never leak into a named agent's
        # policy); b.example has no badbot group -> '*' fallback
        ("a.example", "/"),
        ("b.example", "/a"),
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
    # RFC 9309 §2.2.1: mybot has a named group, so ONLY it applies —
    # the '*' group's Disallow does not bind mybot
    assert got == {1: False, 2: True}
    star = {r.doc_id: r.allowed
            for r in robots_filter(urls, robots).collect()}
    assert star == {1: True, 2: False}


def test_star_allow_cannot_override_named_disallow(spark):
    """The ADVICE r4 failure mode: a LONGER Allow in the '*' group
    must not override a named group's Disallow for that agent."""
    robots = spark.createDataFrame(
        [("h.example",
          "User-agent: mybot\nDisallow: /secret\n\n"
          "User-agent: *\nAllow: /secret/public\n")],
        ["host", "robots_txt"],
    )
    urls = _urls(spark, [(1, "http://h.example/secret/public/x")])
    got = robots_filter(urls, robots, agent="mybot").collect()[0]
    assert got.allowed is False and got.rule_path == "/secret"
    # for every OTHER agent the '*' group is the policy: allowed
    other = robots_filter(urls, robots, agent="elsebot").collect()[0]
    assert other.allowed is True
