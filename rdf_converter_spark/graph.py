# -*- coding: utf-8 -*-
"""``SparkGraph`` — the rdflib-``Graph``-shaped migration façade.

The reference's consumers hold ``rdflib.Graph`` objects (every
converter returns one — ``ld_converter.py:95-96`` builds and
serializes them) and use a handful of methods on them: ``query()``
with SPARQL text, ``triples()`` pattern iteration, ``add``/
``remove``, ``parse``/``serialize``, ``len``/``in``. This class maps
that exact surface onto the engine's distributed primitives, so the
migration is a constructor swap:

    g = SparkGraph(triples_df)              # any (subj,pred,obj) df
    for s, p, o in g.triples((None, RDF_TYPE, None)): ...
    rows = g.query("SELECT ?s WHERE { ?s a <…> }")   # DataFrame
    g2 = g.update('INSERT DATA { <s> <p> "o" }')     # NEW graph
    g2.serialize("out.ttl", format="turtle")

Triple identity is the FULL term: ``(subj, pred, obj, obj_is_uri,
obj_lang, obj_datatype)`` — ``"x"@en`` and ``"x"@fr`` are distinct
triples (RDF semantics), so ``len``/``add``/``+`` key on all six
columns (null-safe). ``__contains__``/``triples()`` take bare
``(s, p, o)`` tuples and match LEXICALLY — any tag variant counts —
because that is the probe shape rdflib callers pass.

When the flag columns are absent, ``obj_is_uri`` defaults from a
``http://``/``https://`` prefix heuristic — a convenience for plain
3-column tables, NOT RDF-faithful (a literal that happens to start
with a URL scheme is misclassified); pass the real flag column for
correctness.

Two deliberate divergences from rdflib, both scale-driven:

- **Immutability.** ``add``/``remove``/``update`` return a NEW
  ``SparkGraph`` over a new plan instead of mutating in place —
  DataFrames are immutable, and the functional contract is what
  makes checkpoint/retry safe (same stance as
  ``bgp.update_where``). rdflib-style in-place mutation of a
  10^12-triple store is the anti-pattern this engine exists to
  replace.
- **Laziness.** Nothing executes until an action (``query`` returns
  a DataFrame to aggregate/collect; ``triples()`` uses
  ``toLocalIterator`` so the driver never holds the full graph).

Scale notes: ``__contains__``/``triples`` with bound terms compile
to pushed-down point filters (LocalLimit-1 short circuit for the
membership probe); ``__len__`` is one distinct count; serialization
uses the distributed NT writer for large graphs and the pretty
Turtle writer (reference-parity prefixes) for driver-sized ones.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COLS = ("subj", "pred", "obj")
_FULL = ("subj", "pred", "obj", "obj_is_uri", "obj_lang",
         "obj_datatype")


class SparkGraph:
    """An immutable RDF graph view over a ``(subj, pred, obj[,
    obj_is_uri, obj_lang, obj_datatype])`` DataFrame."""

    def __init__(self, triples: DataFrame):
        missing = [c for c in _COLS if c not in triples.columns]
        if missing:
            raise ValueError(
                "SparkGraph needs columns %s; missing %s"
                % (list(_COLS), missing))
        df = triples
        for c, t in (("obj_is_uri", "boolean"), ("obj_lang", "string"),
                     ("obj_datatype", "string")):
            if c not in df.columns:
                default = (
                    F.col("obj").startswith("http://")
                    | F.col("obj").startswith("https://")
                    if c == "obj_is_uri"
                    else F.lit(None).cast(t))
                df = df.withColumn(c, default)
        self.df = df.select(*_FULL)

    # -- construction ---------------------------------------------------
    @classmethod
    def parse(cls, spark: SparkSession, path: str,
              format: str = "nt") -> "SparkGraph":
        """Load from N-Triples / N-Quads (distributed line parse) or
        Turtle (distributed whole-file parse) — ``sources/rdf.py``."""
        from .sources.rdf import read_nquads, read_ntriples, read_turtle

        if format in ("nt", "ntriples", "nt11"):
            return cls(read_ntriples(spark, path))
        if format in ("nquads", "nq"):
            return cls(read_nquads(spark, path).drop("graph"))
        if format in ("turtle", "ttl"):
            return cls(read_turtle(spark, path))
        raise ValueError(
            "unsupported parse format %r (nt / nquads / turtle)"
            % format)

    # -- rdflib-style read surface --------------------------------------
    def __len__(self) -> int:
        # full-term identity: "x"@en and "x"@fr are two triples
        return self.df.select(*_FULL).distinct().count()

    def __contains__(self, spo: Tuple[str, str, str]) -> bool:
        s, p, o = spo
        return bool(
            self.df.filter(
                (F.col("subj") == s) & (F.col("pred") == p)
                & (F.col("obj") == o)
            ).limit(1).take(1)
        )

    def triples(
        self,
        spo: Tuple[Optional[str], Optional[str], Optional[str]]
        = (None, None, None),
    ) -> Iterator[Tuple[str, str, str]]:
        """Iterate matching triples (``None`` = wildcard) without
        collecting the graph to the driver."""
        df = self.df
        for col, term in zip(_COLS, spo):
            if term is not None:
                df = df.filter(F.col(col) == term)
        for row in df.select(*_COLS).toLocalIterator():
            yield (row.subj, row.pred, row.obj)

    def value(self, subject: str, predicate: str) -> Optional[str]:
        """First object for (subject, predicate) — deterministic
        (minimum), unlike rdflib's arbitrary pick."""
        rows = (
            self.df.filter((F.col("subj") == subject)
                           & (F.col("pred") == predicate))
            .agg(F.min("obj").alias("o")).take(1)
        )
        return rows[0].o if rows else None

    # -- SPARQL ---------------------------------------------------------
    def query(self, text: str):
        """SPARQL SELECT/ASK/CONSTRUCT/DESCRIBE text
        (``operators/sparql_text.py``). SELECT/CONSTRUCT/DESCRIBE
        return a DataFrame; ASK returns bool."""
        from .operators.sparql_text import sparql_query

        return sparql_query(self.df, text)

    def update(self, text: str) -> "SparkGraph":
        """SPARQL Update text — returns the NEW graph (functional)."""
        from .operators.sparql_text import parse_query, sparql_query

        if parse_query(text)["form"] != "update":
            raise ValueError("update() takes SPARQL Update strings; "
                             "use query() for query forms")
        return SparkGraph(sparql_query(self.df, text))

    # -- functional mutation --------------------------------------------
    def add(self, spo, obj_is_uri: bool = False,
            lang: Optional[str] = None,
            datatype: Optional[str] = None) -> "SparkGraph":
        s, p, o = spo
        row = self.df.sparkSession.createDataFrame(
            [(s, p, o, bool(obj_is_uri), lang, datatype)],
            "subj string, pred string, obj string, obj_is_uri boolean,"
            " obj_lang string, obj_datatype string",
        )
        # full-term anti-join, NULL-SAFE on the nullable tag columns
        # (a plain on=list join would never match null keys and every
        # add of an untagged triple would duplicate)
        cond = None
        for c in _FULL:
            eq = row[c].eqNullSafe(self.df[c])
            cond = eq if cond is None else cond & eq
        new = row.join(self.df, on=cond, how="left_anti")
        return SparkGraph(self.df.unionByName(new))

    def remove(self, spo) -> "SparkGraph":
        """Remove matching triples (``None`` = wildcard)."""
        cond = F.lit(True)
        for col, term in zip(_COLS, spo):
            if term is not None:
                cond = cond & (F.col(col) == term)
        return SparkGraph(self.df.filter(~cond))

    def __add__(self, other: "SparkGraph") -> "SparkGraph":
        # dropDuplicates treats nulls as equal, so full-term identity
        # needs no sentinel here
        return SparkGraph(
            self.df.unionByName(other.df).dropDuplicates(list(_FULL)))

    # -- serialization --------------------------------------------------
    def serialize(self, path: str, format: str = "turtle",
                  distributed: bool = False):
        """Write Turtle (reference-parity prefixes, driver-sized) or
        N-Triples (``distributed=True`` for the parallel writer)."""
        from .operators import export

        if format in ("turtle", "ttl"):
            if distributed:
                raise ValueError(
                    "distributed Turtle output is not supported "
                    "(Turtle is document-scoped) — serialize "
                    "format='nt' with distributed=True instead")
            return export.to_turtle_pretty(self.df, path)
        if format in ("nt", "ntriples"):
            if distributed:
                return export.to_turtle_distributed(self.df, path)
            return export.to_turtle(self.df, path)
        raise ValueError(
            "unsupported serialize format %r (turtle / nt)" % format)
