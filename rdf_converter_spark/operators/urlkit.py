# -*- coding: utf-8 -*-
"""URL canonicalization + URL-level dedup — the first pass of every
web-crawl training pipeline (the same page is crawled as http/https,
with/without tracking params, fragments, default ports, case-varied
hosts).

Pure regexp expressions (JVM codegen; RE2-compatible — no lookaheads —
so the DuckDB oracle replicates them verbatim, replacement syntax
aside: Java ``$1`` vs RE2 ``\\1``). At 10^12 pages the canonical key
is also the natural partitioner for crawl dedup: one hash exchange on
``canonical_url``, survivor = min doc id per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking query parameters dropped during canonicalization
TRACKING_RE = r"(utm_[a-z]+|fbclid|gclid|mc_eid|ref)"


def canonical_url(u: Column) -> Column:
    """Canonical form: fragment stripped; scheme+host lowercased;
    default ports removed; tracking params dropped; empty query and
    trailing slashes trimmed."""
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://host (the part before the first / or ?)
    auth = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(auth != "", F.concat(F.lower(auth), rest)).otherwise(u)
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?]+):80([/?]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?]+):443([/?]|$)", "$1$2")
    # 4. tracking params: one pattern matches a RUN of consecutive
    #    tracking pairs (each ending in & or end-of-string) so chains
    #    fall in a single global pass; then dangling separators
    run = r"([?&])(?:(?:" + TRACKING_RE + r")=[^&#]*(?:&|$))+"
    u = F.regexp_replace(u, run, "$1")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 5. trailing slashes (path-level; keeps scheme://host intact
    #    because the host match above never ends in /)
    u = F.regexp_replace(u, r"(.)/+$", "$1")
    return u


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Group by canonical URL: survivor = min id, group size."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count("*").alias("n_variants"),
        )
    )


# host = authority minus port/userinfo, lowercased. One extract, no
# UDF; the same RE2 pattern runs verbatim in the DuckDB oracle.
HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def host_of(u: Column) -> Column:
    """Registered host of a URL (lowercase; empty string when the
    value has no scheme://authority shape — callers treat that as
    'no host', mirroring crawl frontier behavior)."""
    return F.lower(F.regexp_extract(u, HOST_RE, 1))


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``a.b.c -> [a.b.c, b.c, c]`` — the key shape for suffix-rule
    blocklists (block ``tracker.com`` and every subdomain). A pure
    array expression (split + transform over a sequence), so the
    corpus side never explodes more than its suffix count and no
    Python runs."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )
