# -*- coding: utf-8 -*-
"""SPARQL property-path evaluation over a triple table.

The reference's graphs are queried through rdflib's SPARQL engine,
whose property paths (``knows/name``, ``^memberOf``, ``(p|q)+``) are
the idiomatic way to traverse a KG without naming every intermediate
variable. This module evaluates the path algebra relationally:

- IRI step            -> filtered scan projected to (subj, obj)
- ``^p``   inverse    -> column swap (zero cost)
- ``p/q``  sequence   -> relational composition (equi-join o=s)
- ``p|q``  alternation-> zero-shuffle Union
- ``p+``   one-or-more-> iterative doubling with per-round distinct +
  localCheckpoint; early-exits when converged (then the result is the
  exact unbounded ``+``), otherwise covers paths of length
  <= 2^max_rounds — the scale-honest bounded form, same contract as
  ``graph.py:khop_neighborhood``. A corpus-scale ``+`` over a
  10^12-edge relation is a connected-components-shaped job; for
  hierarchies that are *schema-sized* use ``rdfs.transitive_closure``.

``*`` and ``?`` (zero-length paths) are rejected: SPARQL's
zero-length path relates EVERY graph node to itself, which at
10^12 triples means materializing the node universe for no
selectivity — callers wanting reflexivity union it in explicitly.

Path syntax: IRIs either bare (no metacharacters) or ``<...>``
-wrapped (required when the IRI contains ``/``, as http IRIs do);
metacharacters ``/ | ^ + ( )``; precedence alt < seq < postfix.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META = "<>()|/^+*?"


def _tokenize(path: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    i = 0
    while i < len(path):
        c = path[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = path.find(">", i)
            if j < 0:
                raise ValueError("unterminated '<' in path %r" % path)
            tokens.append(("iri", path[i + 1:j]))
            i = j + 1
        elif c in "()|/^+":
            tokens.append((c, c))
            i += 1
        elif c in "*?":
            raise ValueError(
                "zero-length path operator %r is unsupported (the "
                "zero-length path relates every node to itself; union "
                "reflexive pairs in explicitly if needed)" % c
            )
        else:
            j = i
            while (j < len(path) and path[j] not in _META
                   and not path[j].isspace()):
                j += 1
            tokens.append(("iri", path[i:j]))
            i = j
    if not tokens:
        raise ValueError("empty property path")
    return tokens


class _Parser:
    """alt := seq ('|' seq)* ; seq := post ('/' post)* ;
    post := prim '+'? ; prim := '^' prim | '(' alt ')' | IRI"""

    def __init__(self, tokens):
        self.toks = tokens
        self.pos = 0

    def peek(self):
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def take(self, kind=None):
        if self.pos >= len(self.toks):
            raise ValueError("unexpected end of property path")
        k, v = self.toks[self.pos]
        if kind is not None and k != kind:
            raise ValueError("expected %r, found %r in path" % (kind, v))
        self.pos += 1
        return k, v

    def parse(self):
        node = self.alt()
        if self.pos != len(self.toks):
            raise ValueError(
                "trailing tokens in property path: %r"
                % [v for _, v in self.toks[self.pos:]]
            )
        return node

    def alt(self):
        parts = [self.seq()]
        while self.peek() == "|":
            self.take("|")
            parts.append(self.seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def seq(self):
        parts = [self.post()]
        while self.peek() == "/":
            self.take("/")
            parts.append(self.post())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def post(self):
        node = self.prim()
        while self.peek() == "+":
            self.take("+")
            node = ("plus", node)
        return node

    def prim(self):
        k = self.peek()
        if k == "^":
            self.take("^")
            return ("inv", self.prim())
        if k == "(":
            self.take("(")
            node = self.alt()
            self.take(")")
            return node
        _, v = self.take("iri")
        return ("iri", v)


def _eval(node, triples: DataFrame, max_rounds: int) -> DataFrame:
    kind = node[0]
    if kind == "iri":
        return (triples.filter(F.col("pred") == node[1])
                .select("subj", "obj"))
    if kind == "inv":
        e = _eval(node[1], triples, max_rounds)
        return e.select(F.col("obj").alias("subj"),
                        F.col("subj").alias("obj"))
    if kind == "seq":
        out = None
        for part in node[1]:
            e = _eval(part, triples, max_rounds)
            if out is None:
                out = e
            else:
                out = (out.alias("a")
                       .join(e.alias("b"), F.col("a.obj") == F.col("b.subj"))
                       .select(F.col("a.subj").alias("subj"),
                               F.col("b.obj").alias("obj")))
        return out
    if kind == "alt":
        out = None
        for part in node[1]:
            e = _eval(part, triples, max_rounds)
            out = e if out is None else out.unionByName(e)
        return out
    if kind == "plus":
        cur = _eval(node[1], triples, max_rounds).distinct().localCheckpoint()
        n = cur.count()
        for _ in range(max_rounds):
            hop = (cur.alias("a")
                   .join(cur.alias("b"), F.col("a.obj") == F.col("b.subj"))
                   .select(F.col("a.subj").alias("subj"),
                           F.col("b.obj").alias("obj")))
            nxt = cur.unionByName(hop).distinct().localCheckpoint()
            m = nxt.count()
            if m == n:
                return nxt  # converged: exact unbounded +
            cur, n = nxt, m
        return cur  # bounded: paths of length <= 2^max_rounds
    raise AssertionError("unknown path node %r" % (kind,))


def path_match(
    triples: DataFrame,
    src: str,
    path: str,
    dst: str,
    max_rounds: int = 4,
) -> DataFrame:
    """Evaluate ``src path dst`` like a SPARQL triple pattern whose
    predicate is a property path. ``src``/``dst`` are variables
    (``?x``) or constants, with the same binding semantics as
    ``bgp.bgp_match`` patterns (a repeated variable filters for
    equality; at least one variable is required). ``max_rounds``
    bounds each ``+`` closure at paths of length <= 2^max_rounds
    unless it converges earlier (see module docstring)."""
    rel = _eval(_Parser(_tokenize(path)).parse(), triples, max_rounds)
    first_col = {}
    order = []
    for col, term in (("subj", src), ("obj", dst)):
        if isinstance(term, str) and term.startswith("?"):
            v = term[1:]
            if not v:
                raise ValueError("empty variable name in path pattern")
            if v in first_col:
                rel = rel.filter(F.col(col) == F.col(first_col[v]))
            else:
                first_col[v] = col
                order.append(v)
        else:
            rel = rel.filter(F.col(col) == term)
    if not first_col:
        raise ValueError(
            "path pattern with two constant endpoints has no bindings"
        )
    return rel.select(*[F.col(first_col[v]).alias(v) for v in order])
