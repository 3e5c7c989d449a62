"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the MeMAD rdf-converter's semantics
(metadata -> RDF triples, MeMAD + EBU Core ontologies) as a
DataFrame/Catalyst pipeline over Common-Crawl-style ``web_pages``
tables, generalized to web scale: vectorized Arrow UDF parsing,
broadcast dimension joins, salted dedup, connected-components
canonicalization, lineage + metrics + checkpoint/resume.

Reference behavior studied from /root/reference (MeMAD-project/
rdf-converter); all quirks cited per-function as ``file:line``.
"""

__version__ = "0.1.0"
