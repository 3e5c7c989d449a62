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
- ``p*`` / ``p?`` zero-or-more / zero-or-one -> the ``+`` closure
  (resp. the step itself) unioned with the identity relation over the
  node universe of the INPUT triple table (SPARQL's zero-length path
  relates every term in the graph to itself; a constant endpoint
  absent from the graph still self-matches, added as a literal row
  after a pushed-down existence probe). The node universe is one
  distinct over (subj ∪ obj) — the same cost class as the dedup this
  engine runs everywhere; when an endpoint is constant, Catalyst
  pushes the equality into both union branches and the identity side
  collapses to a point lookup. Pass a pred-filtered subgraph to bound
  the universe deliberately.
- ``!(p|^q)`` negated property set -> forward edges whose predicate
  is NOT IN the forward members, unioned with reversed edges whose
  predicate is NOT IN the inverse members (each part present only
  when that direction has members, per the SPARQL 1.1 NPS algebra);
  a NOT-IN filter on the scan, never a join.

Path syntax: IRIs either bare (no metacharacters) or ``<...>``
-wrapped (required when the IRI contains ``/``, as http IRIs do);
metacharacters ``/ | ^ + * ? ! ( )``; precedence alt < seq < postfix.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META = "<>()|/^+*?!"


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
        elif c in "()|/^+*?!":
            tokens.append((c, c))
            i += 1
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
    post := prim ('+'|'*'|'?')* ;
    prim := '^' prim | '!' npsmembers | '(' alt ')' | IRI ;
    npsmembers := '(' member ('|' member)* ')' | member ;
    member := '^'? IRI"""

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
        while self.peek() in ("+", "*", "?"):
            k, _ = self.take()
            node = ({"+": "plus", "*": "star", "?": "opt"}[k], node)
        return node

    def prim(self):
        k = self.peek()
        if k == "^":
            self.take("^")
            return ("inv", self.prim())
        if k == "!":
            self.take("!")
            return self.nps()
        if k == "(":
            self.take("(")
            node = self.alt()
            self.take(")")
            return node
        _, v = self.take("iri")
        return ("iri", v)

    def nps(self):
        fwd, inv = [], []

        def member():
            if self.peek() == "^":
                self.take("^")
                inv.append(self.take("iri")[1])
            else:
                fwd.append(self.take("iri")[1])

        if self.peek() == "(":
            self.take("(")
            member()
            while self.peek() == "|":
                self.take("|")
                member()
            self.take(")")
        else:
            member()
        return ("nps", tuple(fwd) or None, tuple(inv) or None)


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
        return _closure(_eval(node[1], triples, max_rounds), max_rounds)
    if kind in ("star", "opt"):
        step = _eval(node[1], triples, max_rounds)
        rel = _closure(step, max_rounds) if kind == "star" else step
        return rel.unionByName(_identity(triples)).dropDuplicates()
    if kind == "nps":
        fwd, inv = node[1], node[2]
        out = None
        if fwd is not None:
            out = (triples.filter(~F.col("pred").isin(list(fwd)))
                   .select("subj", "obj"))
        if inv is not None:
            rev = (triples.filter(~F.col("pred").isin(list(inv)))
                   .select(F.col("obj").alias("subj"),
                           F.col("subj").alias("obj")))
            out = rev if out is None else out.unionByName(rev)
        return out
    raise AssertionError("unknown path node %r" % (kind,))


def _closure(step: DataFrame, max_rounds: int) -> DataFrame:
    """Transitive closure of ``step`` by iterative doubling; exact
    when it converges within ``max_rounds``, else bounded at paths of
    length <= 2^max_rounds (module docstring)."""
    cur = step.distinct().localCheckpoint()
    n = cur.count()
    for _ in range(max_rounds):
        hop = (cur.alias("a")
               .join(cur.alias("b"), F.col("a.obj") == F.col("b.subj"))
               .select(F.col("a.subj").alias("subj"),
                       F.col("b.obj").alias("obj")))
        nxt = cur.unionByName(hop).distinct().localCheckpoint()
        m = nxt.count()
        if m == n:
            return nxt  # converged: exact unbounded closure
        cur, n = nxt, m
    return cur  # bounded: paths of length <= 2^max_rounds


def _identity(triples: DataFrame) -> DataFrame:
    """The zero-length-path relation: (n, n) for every term in the
    input table — ONE distinct over subj ∪ obj, the node universe of
    whatever (possibly pre-filtered) graph the caller passed."""
    nodes = (triples.select(F.col("subj").alias("n"))
             .unionByName(triples.select(F.col("obj").alias("n")))
             .dropDuplicates())
    return nodes.select(F.col("n").alias("subj"), F.col("n").alias("obj"))


def _nullable(node) -> bool:
    """Does the path accept the zero-length path (ε)?"""
    kind = node[0]
    if kind in ("star", "opt"):
        return True
    if kind in ("plus", "inv"):
        return _nullable(node[1])
    if kind == "seq":
        return all(_nullable(p) for p in node[1])
    if kind == "alt":
        return any(_nullable(p) for p in node[1])
    return False  # iri, nps


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
    bounds each ``+``/``*`` closure at paths of length <= 2^max_rounds
    unless it converges earlier (see module docstring)."""
    ast = _Parser(_tokenize(path)).parse()
    rel = _eval(ast, triples, max_rounds)
    consts = [t for t in (src, dst)
              if not (isinstance(t, str) and t.startswith("?"))]
    if len(consts) == 1 and _nullable(ast):
        # SPARQL's zero-length path matches a constant endpoint to
        # itself even when the term is absent from the graph; the
        # identity relation inside _eval only covers graph terms, so
        # probe (pushed-down point filter, LocalLimit-1 short
        # circuit) and add the literal row if missing.
        c = consts[0]
        present = (triples.filter((F.col("subj") == c)
                                  | (F.col("obj") == c))
                   .limit(1).count() > 0)
        if not present:
            rel = rel.unionByName(triples.sparkSession.createDataFrame(
                [(c, c)], "subj string, obj string"))
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
