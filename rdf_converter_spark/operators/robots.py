# -*- coding: utf-8 -*-
"""robots.txt parsing and URL filtering (Robots Exclusion Protocol).

A crawl-curation primitive: given a per-host ``robots.txt`` body and
a URL table, decide which URLs a compliant crawler for a given agent
may keep. Semantics follow the classic REP as standardized by RFC
9309's core rules, minus wildcards: groups are runs of consecutive
``User-agent`` lines followed by their rules; per §2.2.1 a crawler
obeys the MOST SPECIFIC matching groups — the groups naming the
agent exactly when any exist for the host, else the ``*`` groups;
``Allow``/``Disallow`` values are path
prefixes; the LONGEST matching rule wins and ``Allow`` beats
``Disallow`` on ties; an empty ``Disallow:`` matches nothing; a URL
with no matching rule (or no robots.txt at all) is allowed.
Comments (``#``), blank lines, CRLF endings and directive casing are
handled.

Scale shape (100 TB lens): robots bodies are bounded (RFC caps the
parse obligation at 500 KiB) and per-host, so the parse is a
posexplode + two window passes PARTITIONED BY HOST — state never
exceeds one robots file. The filter joins URLs to applicable rules on
host (both sides hash-partitioned on the same key, one exchange
each; rule tables are #hosts-sized, NOT broadcastable at crawl
scale) and picks the winner with one per-URL rank window. Nothing is
all-pairs; every stage keys on host or url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> (host, rule_path, is_allow, pos) —
    the prefix rules applicable to ``agent``. Group assignment is
    relational: a ``User-agent`` line opens a new group only when the
    previous line was not itself a ``User-agent`` line (consecutive
    agent lines share one group, per the RFC)."""
    w = Window.partitionBy(host_col).orderBy("pos")
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("pos", "raw"),
        )
        # strip comments, CR and surrounding whitespace
        .withColumn(
            "line",
            F.trim(F.regexp_replace(
                F.regexp_replace("raw", "#.*$", ""), "\r", ""
            )),
        )
        .withColumn(
            "directive",
            F.when(
                F.instr("line", ":") > 0,
                F.lower(F.trim(F.substring_index("line", ":", 1))),
            ),
        )
        .withColumn(
            "value",
            F.when(
                F.instr("line", ":") > 0,
                F.trim(F.expr("substring(line, instr(line, ':') + 1)")),
            ),
        )
        .withColumn("is_ua", F.col("directive") == "user-agent")
        .withColumn(
            "is_rule",
            F.col("directive").isin("allow", "disallow")
            & (F.col("value") != ""),  # empty Disallow: matches nothing
        )
        .filter(F.col("is_ua") | F.col("is_rule"))
    )
    grouped = lines.withColumn(
        "new_group",
        (F.col("is_ua")
         & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)))
        .cast("int"),
    ).withColumn(
        "group_id",
        F.sum("new_group").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # RFC 9309 §2.2.1 group selection: a crawler obeys the MOST
    # SPECIFIC matching group(s) — groups naming the agent exactly
    # when any exist for the host, otherwise the '*' groups. A '*'
    # rule never leaks into a named agent's policy (r4 unioned both,
    # letting a longer '*' Allow override a named Disallow).
    per_group = (
        grouped.filter("is_ua")
        .groupBy("host", "group_id")
        .agg(
            F.max(F.lower("value") == agent.lower()).alias("named"),
            F.max(F.col("value") == "*").alias("star"),
        )
    )
    host_w = Window.partitionBy("host")
    applies = (
        per_group
        .withColumn("has_named", F.max("named").over(host_w))
        .filter(
            F.col("named") | (F.col("star") & ~F.col("has_named")))
        .select("host", "group_id")
    )
    return (
        grouped.filter("is_rule")
        .join(applies, ["host", "group_id"])
        .select(
            "host",
            F.col("value").alias("rule_path"),
            (F.col("directive") == "allow").alias("is_allow"),
            "pos",
        )
    )


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Apply per-host robots rules to a URL table. Returns every
    input row plus ``(host, path, allowed, rule_path, rule_is_allow)``
    — ``rule_path`` is the winning (longest, allow-on-tie) rule or
    NULL when nothing matched (allowed by default, which also covers
    hosts with no robots.txt)."""
    rules = parse_robots(
        robots, agent=agent, host_col=host_col, text_col=text_col
    )
    u = urls.withColumn(
        "host",
        F.lower(F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
    ).withColumn(
        "path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    matched = (
        u.select(url_col, "host", "path")
        .join(rules, "host")
        .filter(F.col("path").startswith(F.col("rule_path")))
    )
    rank = Window.partitionBy(url_col).orderBy(
        F.length("rule_path").desc(),
        F.col("is_allow").desc(),
        F.col("pos").asc(),
    )
    winner = (
        matched.withColumn("rn", F.row_number().over(rank))
        .filter("rn = 1")
        .select(
            url_col,
            F.col("rule_path"),
            F.col("is_allow").alias("rule_is_allow"),
        )
    )
    return u.join(winner, url_col, "left").withColumn(
        "allowed", F.coalesce("rule_is_allow", F.lit(True))
    )
