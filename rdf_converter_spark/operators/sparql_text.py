# -*- coding: utf-8 -*-
"""SPARQL 1.1 *text* front-end over the pattern-list query surface.

The engine's SPARQL semantics live in ``operators/bgp.py`` (BGP
joins, OPTIONAL, FILTER, MINUS, VALUES, BIND, EXISTS, aggregates,
solution modifiers) and take Python pattern lists. Users migrating
from ``rdflib.Graph.query`` hold QUERY STRINGS — this module closes
that gap: a tokenizer + recursive-descent parser for the SELECT /
ASK / CONSTRUCT subset the engine executes, lowering onto the
existing operators (the reference itself has no query surface at
all — its consumers query the emitted graphs through rdflib, e.g.
the graphs built by ``ld_converter.py:95-96``; this front-end is
what lets those consumers keep their query strings).

Supported grammar (fail-fast ``SparqlSyntaxError`` on anything
outside it — never a silent wrong answer):

- ``PREFIX``/``BASE`` declarations; ``<iri>``, ``pfx:local``, ``a``
  (= rdf:type), ``"literal"`` (with ``\\"`` escapes), numeric
  literals, ``?var``/``$var``.
- ``SELECT [DISTINCT] ?v ... | * | (expr AS ?v)`` with aggregate
  projections (COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT),
  ``ASK``, ``CONSTRUCT { template } WHERE { ... }``.
- Group graph pattern: triple blocks with ``;`` predicate lists and
  ``,`` object lists; ``OPTIONAL { }``; ``MINUS { }``;
  ``FILTER (expr)`` / ``FILTER [NOT] EXISTS { }``;
  ``BIND (expr AS ?v)``; ``VALUES ?v { ... }`` (single- and
  multi-var row form); top-level ``{ } UNION { }``.
- ``GROUP BY`` / ``HAVING`` / ``ORDER BY [ASC|DESC](?v)`` /
  ``LIMIT`` / ``OFFSET``.
- Property paths in predicate position of the MAIN where group
  (``^``, ``/``, ``|``, ``+``, ``*``, ``?``, ``!(...)`` negated
  sets, grouping parens) — lowered to
  ``operators/paths.py:path_match`` relations and joined into the
  BGP via ``bgp_match(relations=...)``.
- ``DESCRIBE <iri>`` (pushed-down subject point filter) and
  ``DESCRIBE ?v WHERE { plain patterns }`` (``bgp.describe``).
- ``GRAPH <g> { … }`` / ``GRAPH ?g { … }`` blocks in SELECT queries
  (every pattern scoped; lowered to ``quad_match`` — a constant
  graph term is a partition-pruning filter on the quad table's
  graph column).
- ``{ SELECT … }`` subqueries in the main WHERE group (evaluated
  bottom-up per SPARQL 1.1 §12, joined on shared variables through
  the ``relations`` hook).
- SPARQL 1.1 Update strings: ``INSERT DATA`` / ``DELETE DATA`` /
  ``DELETE WHERE`` / ``DELETE { } INSERT { } WHERE { }`` — executed
  functionally (``sparql_query`` returns the NEW triple table, the
  caller persists it: the ``bgp.update_where`` contract).
- FILTER/BIND expressions are rewritten to Spark SQL: ``&&``/``||``
  / ``!`` to AND/OR/NOT, ``REGEX(v, p)`` to RLIKE, ``BOUND(?v)`` to
  IS NOT NULL, STRLEN/UCASE/LCASE/STRSTARTS/STRENDS/CONTAINS/STR to
  their Spark builtins — then validated by ``bgp_match`` against the
  bound variable set exactly like hand-passed filter strings.

Out of scope, by design (raise): federated SERVICE; property paths,
GRAPH blocks and subqueries inside OPTIONAL/MINUS/EXISTS groups or
UNION branches; GRAPH mixed with unscoped patterns / non-SELECT
forms; FROM / FROM NAMED dataset clauses (the dataset IS the
DataFrame argument); language-tagged (``"x"@en``) and
datatype-annotated (``"1"^^xsd:int``) literal SYNTAX — the engine
stores tags in separate ``obj_lang``/``obj_datatype`` columns, so
tag constraints are plain FILTERs on those columns instead.

Scale shape: parsing is driver-side over a bounded query string
(microseconds); everything executed is the SAME plan the pattern-
list API builds — constants pushed to the scan,
most-constrained-first join order, fail-fast cartesian check.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame

from .bgp import (
    ask, bgp_aggregate, bgp_match, bgp_union, construct,
    solution_modifiers,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>\s]*>)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<var>[?$]\w+)
    | (?P<pname>\w*:[\w.-]*)
    | (?P<num>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<word>[A-Za-z_]\w*)
    | (?P<punct>&&|\|\||!=|<=|>=|[{}().;,*=<>!/+^?|-])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "ask", "construct", "where", "prefix", "base", "distinct",
    "optional", "filter", "minus", "union", "bind", "values", "as",
    "group", "having", "order", "by", "asc", "desc", "limit", "offset",
    "exists", "not", "a", "true", "false", "undef", "in", "describe",
    "reduced", "from", "named", "graph", "service", "insert", "delete",
    "data",
}

_AGG_FNS = {"count", "sum", "min", "max", "avg", "sample", "group_concat"}

# SPARQL builtin -> Spark SQL rewrite (callable takes arg strings)
_FN_MAP = {
    "strlen": lambda a: "length(%s)" % a[0],
    "ucase": lambda a: "upper(%s)" % a[0],
    "lcase": lambda a: "lower(%s)" % a[0],
    "contains": lambda a: "contains(%s, %s)" % (a[0], a[1]),
    "strstarts": lambda a: "startswith(%s, %s)" % (a[0], a[1]),
    "strends": lambda a: "endswith(%s, %s)" % (a[0], a[1]),
    "regex": lambda a: "(%s RLIKE %s)" % (a[0], a[1]),
    "bound": lambda a: "(%s IS NOT NULL)" % a[0],
    "str": lambda a: "CAST(%s AS STRING)" % a[0],
    "substr": lambda a: "substring(%s)" % ", ".join(a),
    "concat": lambda a: "concat(%s)" % ", ".join(a),
    "abs": lambda a: "abs(%s)" % a[0],
    "ceil": lambda a: "ceil(%s)" % a[0],
    "floor": lambda a: "floor(%s)" % a[0],
    "round": lambda a: "round(%s)" % a[0],
    "coalesce": lambda a: "coalesce(%s)" % ", ".join(a),
    "if": lambda a: "if(%s, %s, %s)" % (a[0], a[1], a[2]),
    "sameterm": lambda a: "(%s = %s)" % (a[0], a[1]),
    "isliteral": lambda a: a[0],  # handled specially below
    "isiri": lambda a: a[0],
    "isuri": lambda a: a[0],
}


def _tokenize(text: str) -> List[Tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                "cannot tokenize SPARQL at %r" % text[pos:pos + 30])
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "word" and val.lower() in _KEYWORDS:
            kind = "kw"
            val = val.lower()
        out.append((kind, val))
    out.append(("eof", ""))
    return out


class _P:
    """Recursive-descent parser state."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict = {}
        self.base = ""

    # -- token plumbing -------------------------------------------------
    def peek(self, k: int = 0) -> Tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tuple[str, str]:
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        k, v = self.peek()
        return k == "kw" and v in words

    def eat_kw(self, word: str) -> None:
        k, v = self.next()
        if k != "kw" or v != word:
            raise SparqlSyntaxError("expected %r, got %r" % (word, v))

    def eat_punct(self, p: str) -> None:
        k, v = self.next()
        if k != "punct" or v != p:
            raise SparqlSyntaxError("expected %r, got %r" % (p, v))

    # -- terms ----------------------------------------------------------
    def expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError("undeclared prefix %r" % pfx)
        return self.prefixes[pfx] + local

    def term(self) -> str:
        """One RDF term in pattern position -> the engine's string
        convention: ``?var`` stays, IRIs/literals become bare column
        values (the triple table stores both unquoted)."""
        k, v = self.next()
        if k == "var":
            return "?" + v[1:]
        if k == "iri":
            return self.base + v[1:-1]
        if k == "pname":
            return self.expand_pname(v)
        if k == "string":
            return _unescape(v[1:-1])
        if k == "num":
            return v
        if k == "kw" and v == "a":
            return RDF_TYPE
        if k == "kw" and v in ("true", "false"):
            return v
        raise SparqlSyntaxError("expected an RDF term, got %r" % v)

    # -- prologue -------------------------------------------------------
    def prologue(self) -> None:
        while self.at_kw("prefix", "base"):
            _, v = self.next()
            if v == "prefix":
                k, p = self.next()
                if k != "pname" or not p.endswith(":"):
                    raise SparqlSyntaxError("bad PREFIX name %r" % p)
                ki, iri = self.next()
                if ki != "iri":
                    raise SparqlSyntaxError("bad PREFIX IRI %r" % iri)
                self.prefixes[p[:-1]] = self.base + iri[1:-1]
            else:
                ki, iri = self.next()
                if ki != "iri":
                    raise SparqlSyntaxError("bad BASE IRI %r" % iri)
                self.base = iri[1:-1]

    # -- property paths in predicate position ---------------------------
    def _path_iri(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self.base + v[1:-1]
        if k == "pname":
            return self.expand_pname(v)
        if k == "kw" and v == "a":
            return RDF_TYPE
        raise SparqlSyntaxError(
            "expected an IRI inside a property path, got %r" % v)

    def _path_text(self, first: "str | None" = None) -> str:
        """Consume a SPARQL 1.1 property-path expression, emitting
        the ``operators/paths.py`` text form (every IRI expanded and
        ``<>``-wrapped). ``first`` is an already-consumed leading
        IRI when the caller only discovered the path at its first
        operator token."""
        parts: List[str] = []

        def at_op(*ops):
            k, v = self.peek()
            return k == "punct" and v in ops

        def prim():
            if at_op("^"):
                self.next()
                parts.append("^")
                prim()
            elif at_op("!"):
                self.next()
                parts.append("!")
                nps()
            elif at_op("("):
                self.next()
                parts.append("(")
                alt()
                self.eat_punct(")")
                parts.append(")")
            else:
                parts.append("<%s>" % self._path_iri())

        def nps():
            if at_op("("):
                self.next()
                parts.append("(")
                member()
                while at_op("|"):
                    self.next()
                    parts.append("|")
                    member()
                self.eat_punct(")")
                parts.append(")")
            else:
                member()

        def member():
            if at_op("^"):
                self.next()
                parts.append("^")
            parts.append("<%s>" % self._path_iri())

        def post():
            prim()
            while at_op("+", "*", "?"):
                parts.append(self.next()[1])

        def seq_tail():
            while at_op("/"):
                self.next()
                parts.append("/")
                post()

        def seq():
            post()
            seq_tail()

        def alt_tail():
            while at_op("|"):
                self.next()
                parts.append("|")
                seq()

        def alt():
            seq()
            alt_tail()

        if first is not None:
            parts.append("<%s>" % first)
            while at_op("+", "*", "?"):
                parts.append(self.next()[1])
            seq_tail()
            alt_tail()
        else:
            alt()
        return "".join(parts)

    def _pred_or_path(self) -> Tuple[str, str]:
        """Predicate position: ``("term", t)`` for a plain term /
        variable, ``("path", text)`` for a property path."""
        k, v = self.peek()
        if k == "punct" and v in ("^", "!", "("):
            return ("path", self._path_text())
        p = self.term()
        nk, nv = self.peek()
        if (not p.startswith("?") and nk == "punct"
                and nv in ("/", "|", "+", "*", "?")):
            return ("path", self._path_text(first=p))
        return ("term", p)

    # -- triples block --------------------------------------------------
    def triples_block(
        self, paths: "List[Tuple[str, str, str]] | None" = None
    ) -> List[Tuple[str, str, str]]:
        """subj pred obj (';' pred obj)* (',' obj)* '.'? — repeated.
        Property-path predicates land in ``paths`` (as
        ``(s, path_text, o)``) instead of the returned pattern
        list; passing ``paths=None`` rejects them."""
        pats = []
        while True:
            k, v = self.peek()
            if k in ("eof",) or (k == "punct" and v in ("}", "{")) \
                    or k == "kw":
                break
            s = self.term()
            while True:
                kind, p = self._pred_or_path()
                if kind == "path" and paths is None:
                    raise SparqlSyntaxError(
                        "property paths are only supported in the "
                        "main WHERE group (not OPTIONAL/MINUS/EXISTS "
                        "groups or CONSTRUCT templates)")
                while True:
                    o = self.term()
                    if kind == "path":
                        paths.append((s, p, o))
                    else:
                        pats.append((s, p, o))
                    if self.peek() == ("punct", ","):
                        self.next()
                        continue
                    break
                if self.peek() == ("punct", ";"):
                    self.next()
                    # dangling ';' before '.' or '}' is legal SPARQL
                    nk, nv = self.peek()
                    if nk == "punct" and nv in (".", "}"):
                        break
                    continue
                break
            if self.peek() == ("punct", "."):
                self.next()
        return pats

    # -- expressions ----------------------------------------------------
    def expr_string(self, stop_comma: bool = False) -> str:
        """Consume a SPARQL expression, emitting a Spark SQL string
        with ``?var`` references (validated downstream by bgp_match).
        Stops at an unbalanced ')' (the caller's closer), at a
        top-level ',' when ``stop_comma`` (builtin argument lists),
        or at expression-terminating keywords."""
        parts: List[str] = []
        depth = 0
        while True:
            k, v = self.peek()
            if k == "eof":
                break
            if k == "punct" and v == ")" and depth == 0:
                break
            if stop_comma and k == "punct" and v in (",", ";") \
                    and depth == 0:
                break
            if k == "kw" and depth == 0 and v in (
                "as", "group", "having", "order", "limit", "offset",
                "filter", "optional", "minus", "bind", "values", "union",
            ):
                break
            if k == "punct" and v == "}" and depth == 0:
                break
            self.next()
            if k == "punct":
                if v == "(":
                    depth += 1
                    parts.append("(")
                elif v == ")":
                    depth -= 1
                    parts.append(")")
                elif v == "&&":
                    parts.append(" AND ")
                elif v == "||":
                    parts.append(" OR ")
                elif v == "!":
                    parts.append(" NOT ")
                elif v == "!=":
                    parts.append(" <> ")
                else:
                    parts.append(" %s " % v)
            elif k == "var":
                parts.append("?" + v[1:])
            elif k == "string":
                parts.append("'%s'" % _unescape(v[1:-1]).replace("'", "''"))
            elif k == "num":
                parts.append(v)
            elif k == "kw" and v in ("true", "false"):
                parts.append(v.upper())
            elif k == "kw" and v in ("in", "not"):
                parts.append(" %s " % v.upper())
            elif k == "word":
                fn = v.lower()
                if fn in _FN_MAP and self.peek() == ("punct", "("):
                    parts.append(self._builtin_call(fn))
                else:
                    parts.append(v)
            elif k == "iri":
                parts.append("'%s'" % (self.base + v[1:-1]))
            elif k == "pname":
                parts.append("'%s'" % self.expand_pname(v))
            elif k == "kw":
                # keywords inside nested calls (CAST(?x AS INT)) pass
                # through; Spark's analyzer rejects genuine misuse
                parts.append(" %s " % v.upper())
            else:
                raise SparqlSyntaxError(
                    "unexpected %r in expression" % v)
        expr = "".join(parts).strip()
        if not expr:
            raise SparqlSyntaxError("empty expression")
        return expr

    def _builtin_call(self, fn: str) -> str:
        """Parse ``fn(arg, ...)`` where args are nested expressions."""
        self.eat_punct("(")
        args = []
        if self.peek() != ("punct", ")"):
            while True:
                args.append(self.expr_string(stop_comma=True))
                if self.peek() == ("punct", ","):
                    self.next()
                    continue
                break
        self.eat_punct(")")
        if fn in ("isliteral", "isiri", "isuri"):
            raise SparqlSyntaxError(
                "%s() needs the obj_is_uri flag column — query the "
                "triple table directly for term-kind tests" % fn.upper())
        try:
            return _FN_MAP[fn](args)
        except IndexError:
            raise SparqlSyntaxError(
                "%s(): wrong argument count (%d)" % (fn.upper(), len(args)))

    # -- group graph pattern --------------------------------------------
    def group(self) -> dict:
        """Parse ``{ ... }`` into the bgp_match argument bundle, or a
        UNION of bundles."""
        self.eat_punct("{")
        g = {
            "patterns": [], "optional": [], "filters": [], "minus": [],
            "values": [], "exists": [], "not_exists": [], "binds": [],
            "paths": [], "graphs": [], "subqueries": [], "unions": None,
        }
        while True:
            k, v = self.peek()
            if k == "punct" and v == "}":
                self.next()
                break
            if k == "punct" and v == "{" and \
                    self.peek(1) == ("kw", "select"):
                # { SELECT … } subquery: evaluated bottom-up and
                # joined into the enclosing group on shared variables
                # (via bgp_match's relations hook)
                self.next()
                self.eat_kw("select")
                g["subqueries"].append(_select_spec(self))
                self.eat_punct("}")
                continue
            if k == "punct" and v == "{":
                # nested group: only the UNION form is supported in text
                branches = [self._plain_group()]
                while self.at_kw("union"):
                    self.next()
                    branches.append(self._plain_group())
                if len(branches) < 2:
                    raise SparqlSyntaxError(
                        "nested group without UNION — flatten it or use "
                        "the Python API for subqueries")
                if g["patterns"] or g["unions"]:
                    raise SparqlSyntaxError(
                        "UNION mixed with other top-level patterns is "
                        "not supported in text form")
                for b in branches:
                    if (b["optional"] or b["minus"] or b["values"]
                            or b["binds"] or b["exists"]
                            or b["not_exists"]):
                        raise SparqlSyntaxError(
                            "UNION branches support plain triple "
                            "patterns and FILTERs only in text form")
                g["unions"] = branches
                continue
            if k == "kw":
                if v == "optional":
                    self.next()
                    g["optional"].append(self._plain_group()["patterns"])
                    continue
                if v == "minus":
                    self.next()
                    g["minus"].append(self._plain_group()["patterns"])
                    continue
                if v == "filter":
                    self.next()
                    if self.at_kw("exists"):
                        self.next()
                        g["exists"].append(self._plain_group()["patterns"])
                    elif self.at_kw("not"):
                        self.next()
                        self.eat_kw("exists")
                        g["not_exists"].append(
                            self._plain_group()["patterns"])
                    else:
                        self.eat_punct("(")
                        g["filters"].append(self.expr_string())
                        self.eat_punct(")")
                    continue
                if v == "bind":
                    self.next()
                    self.eat_punct("(")
                    expr = self.expr_string()
                    self.eat_kw("as")
                    vk, vv = self.next()
                    if vk != "var":
                        raise SparqlSyntaxError("BIND ... AS needs ?var")
                    self.eat_punct(")")
                    g["binds"].append((vv[1:], expr))
                    continue
                if v == "values":
                    self.next()
                    g["values"].extend(self._values_block())
                    continue
                if v == "graph":
                    self.next()
                    gk, gv = self.peek()
                    if gk == "var":
                        self.next()
                        gterm = "?" + gv[1:]
                    else:
                        gterm = self.term()
                    sub = self._plain_group()
                    if (sub["optional"] or sub["minus"] or sub["values"]
                            or sub["exists"] or sub["not_exists"]
                            or sub["binds"] or sub["graphs"]):
                        raise SparqlSyntaxError(
                            "GRAPH blocks support plain triple patterns "
                            "and FILTERs only in text form")
                    g["graphs"].append(
                        (gterm, sub["patterns"], sub["filters"]))
                    continue
                if v == "service":
                    raise SparqlSyntaxError(
                        "federated SERVICE is not supported")
                if v == "a":
                    pass  # falls through to triples_block
                else:
                    raise SparqlSyntaxError(
                        "unsupported keyword %r in group" % v)
            before = len(g["paths"])
            pats = self.triples_block(paths=g["paths"])
            if not pats and len(g["paths"]) == before:
                raise SparqlSyntaxError(
                    "expected a triple pattern, got %r" % (self.peek(),))
            g["patterns"].extend(pats)
        if g["unions"] and any(
            g[x] for x in ("patterns", "paths", "subqueries", "graphs",
                           "optional", "minus", "values", "binds",
                           "exists", "not_exists")
        ):
            # the creation-time check catches patterns BEFORE the
            # UNION; this catches anything written after it (which
            # would otherwise parse and then be silently dropped)
            raise SparqlSyntaxError(
                "UNION mixed with other group members is not "
                "supported in text form")
        return g

    def _plain_group(self) -> dict:
        g = self.group()
        if g["unions"]:
            raise SparqlSyntaxError(
                "nested UNION inside OPTIONAL/MINUS/EXISTS is not "
                "supported in text form")
        if g["paths"]:
            raise SparqlSyntaxError(
                "property paths are only supported in the main WHERE "
                "group (not OPTIONAL/MINUS/EXISTS groups or CONSTRUCT "
                "templates)")
        if g["graphs"]:
            raise SparqlSyntaxError(
                "GRAPH blocks cannot nest inside other groups in "
                "text form")
        if g["subqueries"]:
            raise SparqlSyntaxError(
                "subqueries are only supported in the main WHERE "
                "group in text form")
        return g

    def template_group(self, ground: bool = False) -> List[tuple]:
        """``{ s p o . … }`` update template: plain triples with
        ``;``/``,`` lists, each row ``(s, p, o, obj_is_iri)`` —
        the 4th element records whether the OBJECT was written as an
        IRI/prefixed name (the static ``obj_is_uri`` flag
        ``bgp.update_where`` takes). ``ground=True`` (the
        INSERT/DELETE DATA forms) rejects variables."""

        def term_k(positional: str):
            k, v = self.peek()
            t = self.term()
            if ground and t.startswith("?"):
                raise SparqlSyntaxError(
                    "variables are not allowed in DATA blocks (%s %r)"
                    % (positional, t))
            return t, k in ("iri", "pname") or (k, v) == ("kw", "a")

        self.eat_punct("{")
        pats: List[tuple] = []
        while self.peek() != ("punct", "}"):
            s, _ = term_k("subject")
            while True:
                pr, _ = term_k("predicate")
                while True:
                    o, is_iri = term_k("object")
                    pats.append((s, pr, o, is_iri))
                    if self.peek() == ("punct", ","):
                        self.next()
                        continue
                    break
                if self.peek() == ("punct", ";"):
                    self.next()
                    nk, nv = self.peek()
                    if nk == "punct" and nv in (".", "}"):
                        break
                    continue
                break
            if self.peek() == ("punct", "."):
                self.next()
        self.next()  # '}'
        if not pats:
            raise SparqlSyntaxError("empty update template")
        return pats

    def _values_block(self) -> List[dict]:
        """VALUES ?v { ... } or VALUES (?a ?b) { (..) (..) }."""
        rows: List[dict] = []
        k, v = self.peek()
        if k == "var":
            self.next()
            name = v[1:]
            self.eat_punct("{")
            while self.peek() != ("punct", "}"):
                if self.at_kw("undef"):
                    raise SparqlSyntaxError("UNDEF is not supported")
                rows.append({name: self.term()})
            self.next()
            return rows
        self.eat_punct("(")
        names = []
        while self.peek()[0] == "var":
            names.append(self.next()[1][1:])
        self.eat_punct(")")
        if not names:
            raise SparqlSyntaxError("VALUES needs at least one variable")
        self.eat_punct("{")
        while self.peek() != ("punct", "}"):
            self.eat_punct("(")
            row = {}
            for n in names:
                if self.at_kw("undef"):
                    raise SparqlSyntaxError("UNDEF is not supported")
                row[n] = self.term()
            self.eat_punct(")")
            rows.append(row)
        self.next()
        return rows


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
            "'": "'", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    # single left-to-right pass: sequential str.replace corrupted
    # escaped backslashes followed by n/t/r ("C:\\network" ->
    # backslash+NEWLINE) because the \n rule saw the second
    # backslash before the \\ rule could consume the pair
    return re.sub(
        r"\\(.)",
        lambda m: _ESCAPES.get(m.group(1), "\\" + m.group(1)),
        s,
    )


def _select_spec(p: "_P") -> dict:
    """Parse a SELECT body (the ``select`` keyword already consumed):
    projection, WHERE group, solution modifiers. Shared between the
    top-level form and ``{ SELECT ... }`` subqueries."""
    spec = {"form": "select"}
    spec["distinct"] = False
    if p.at_kw("distinct"):
        p.next()
        spec["distinct"] = True
    elif p.at_kw("reduced"):
        p.next()  # REDUCED may drop dups; treating as plain is legal
    proj: List[Tuple[str, Optional[str]]] = []
    star = False
    while True:
        tk, tv = p.peek()
        if tk == "var":
            p.next()
            proj.append((tv[1:], None))
        elif (tk, tv) == ("punct", "*"):
            p.next()
            star = True
        elif (tk, tv) == ("punct", "("):
            p.next()
            expr = _proj_expr(p)
            p.eat_kw("as")
            vk, vv = p.next()
            if vk != "var":
                raise SparqlSyntaxError("(expr AS ?var) needs ?var")
            p.eat_punct(")")
            proj.append((vv[1:], expr))
        else:
            break
    if not star and not proj:
        raise SparqlSyntaxError("SELECT needs a projection")
    spec["star"] = star
    spec["projection"] = proj
    if p.at_kw("from"):
        raise SparqlSyntaxError(
            "FROM / FROM NAMED dataset clauses are not supported — "
            "the dataset IS the DataFrame you pass (filter a quad "
            "table's graph column, or use GRAPH blocks)")
    if p.at_kw("where"):
        p.next()
    spec["group"] = p.group()
    _modifiers(p, spec)
    return spec


def parse_query(text: str) -> dict:
    """Parse a SPARQL query or update string into an execution spec
    dict (pure parsing — no Spark). Raises
    :class:`SparqlSyntaxError` outside the supported subset."""
    p = _P(text)
    p.prologue()
    k, v = p.next()
    if (k, v) == ("kw", "select"):
        spec = _select_spec(p)
    elif (k, v) in (("kw", "insert"), ("kw", "delete")):
        spec = _update_spec(p, v)
    elif (k, v) == ("kw", "ask"):
        spec = {"form": "ask"}
        if p.at_kw("where"):
            p.next()
        spec["group"] = p.group()
    elif (k, v) == ("kw", "construct"):
        spec = {"form": "construct"}
        tmpl_group = p._plain_group()
        if (tmpl_group["optional"] or tmpl_group["filters"]
                or tmpl_group["minus"] or tmpl_group["binds"]
                or tmpl_group["values"]):
            raise SparqlSyntaxError(
                "CONSTRUCT template must be plain triples")
        spec["template"] = tmpl_group["patterns"]
        p.eat_kw("where")
        spec["group"] = p.group()
        _modifiers(p, spec)
    elif (k, v) == ("kw", "describe"):
        spec = {"form": "describe"}
        tk, tv = p.next()
        if tk == "var":
            spec["var"] = tv[1:]
            spec["iri"] = None
            if p.at_kw("where"):
                p.next()
            spec["group"] = p.group()
            if (spec["group"]["unions"] or spec["group"]["paths"]
                    or any(spec["group"][x] for x in
                           ("optional", "filters", "minus", "values",
                            "exists", "not_exists", "binds", "graphs",
                            "subqueries"))):
                raise SparqlSyntaxError(
                    "DESCRIBE ?var supports a plain triple-pattern "
                    "WHERE group only")
        elif tk == "iri":
            spec["iri"] = p.base + tv[1:-1]
            spec["group"] = None
        elif tk == "pname":
            spec["iri"] = p.expand_pname(tv)
            spec["group"] = None
        else:
            raise SparqlSyntaxError(
                "DESCRIBE needs ?var or an IRI, got %r" % tv)
    else:
        raise SparqlSyntaxError(
            "expected SELECT/ASK/CONSTRUCT/DESCRIBE/INSERT/DELETE, "
            "got %r" % v)
    if p.peek()[0] != "eof":
        raise SparqlSyntaxError(
            "trailing tokens after query: %r" % (p.peek(),))
    return spec


def _update_spec(p: "_P", first_kw: str) -> dict:
    """SPARQL 1.1 Update text forms lowered onto
    ``bgp.update_where`` (functional: the executor returns the NEW
    triple table): ``INSERT DATA { … }``, ``DELETE DATA { … }``,
    ``DELETE WHERE { … }``, and the full
    ``DELETE { … } INSERT { … } WHERE { … }`` (either template
    optional). Template objects parsed as IRIs/prefixed names get
    ``obj_is_uri=True``; variables default to False (the same static
    flag the Python API takes)."""
    spec = {"form": "update", "delete": [], "insert": [],
            "data": None, "group": None}
    if first_kw == "insert":
        if p.at_kw("data"):
            p.next()
            spec["data"] = "insert"
            spec["insert"] = p.template_group(ground=True)
            return spec
        spec["insert"] = p.template_group()
        p.eat_kw("where")
        spec["group"] = p.group()
        return spec
    # DELETE ...
    if p.at_kw("data"):
        p.next()
        spec["data"] = "delete"
        spec["delete"] = p.template_group(ground=True)
        return spec
    if p.at_kw("where"):
        # DELETE WHERE { … } shorthand: the pattern IS the template
        p.next()
        g = p._plain_group()
        if g["optional"] or g["minus"] or g["values"] or g["binds"] \
                or g["exists"] or g["not_exists"]:
            raise SparqlSyntaxError(
                "DELETE WHERE supports plain patterns + FILTERs only")
        spec["group"] = g
        spec["delete"] = [(s, pr, o, False) for s, pr, o in g["patterns"]]
        return spec
    spec["delete"] = p.template_group()
    if p.at_kw("insert"):
        p.next()
        spec["insert"] = p.template_group()
    p.eat_kw("where")
    spec["group"] = p.group()
    return spec


def _proj_expr(p: _P) -> str:
    """Projection expression: either an aggregate call (kept in
    SPARQL-ish text for bgp_aggregate) or a scalar expression."""
    k, v = p.peek()
    if k == "word" and v.lower() in _AGG_FNS:
        fn = p.next()[1].lower()
        p.eat_punct("(")
        inner = []
        if p.at_kw("distinct"):
            p.next()
            inner.append("DISTINCT")
        if p.peek() == ("punct", "*"):
            p.next()
            inner.append("*")
        elif p.peek() != ("punct", ")"):
            inner.append(p.expr_string(stop_comma=True))
        sep = None
        if p.peek() == ("punct", ";"):  # GROUP_CONCAT(?x; SEPARATOR="-")
            p.next()
            wk, wv = p.next()
            if not (wk == "word" and wv.lower() == "separator"):
                raise SparqlSyntaxError("expected SEPARATOR, got %r" % wv)
            p.eat_punct("=")
            sk, sv = p.next()
            if sk != "string":
                raise SparqlSyntaxError("SEPARATOR needs a string")
            sep = _unescape(sv[1:-1])
        p.eat_punct(")")
        if fn == "group_concat":
            arg = inner[-1]
            collect = ("collect_set" if "DISTINCT" in inner
                       else "collect_list")
            # deterministic form: sorted collect, engine-neutral
            return ("array_join(sort_array(%s(%s)), '%s')"
                    % (collect, arg, (sep if sep is not None else " ")
                       .replace("'", "''")))
        if fn == "sample":
            return "min(%s)" % inner[-1]  # deterministic SAMPLE
        return "%s(%s)" % (fn, " ".join(inner))
    return p.expr_string()


def _modifiers(p: _P, spec: dict) -> None:
    spec.update({"group_by": [], "having": None, "order_by": [],
                 "limit": None, "offset": 0})
    while True:
        if p.at_kw("group"):
            p.next()
            p.eat_kw("by")
            while p.peek()[0] == "var":
                spec["group_by"].append(p.next()[1][1:])
            if not spec["group_by"]:
                raise SparqlSyntaxError("GROUP BY needs variables")
        elif p.at_kw("having"):
            p.next()
            p.eat_punct("(")
            spec["having"] = p.expr_string()
            p.eat_punct(")")
        elif p.at_kw("order"):
            p.next()
            p.eat_kw("by")
            while True:
                tk, tv = p.peek()
                if tk == "var":
                    p.next()
                    spec["order_by"].append(tv[1:])
                elif tk == "kw" and tv in ("asc", "desc"):
                    p.next()
                    p.eat_punct("(")
                    vk, vv = p.next()
                    if vk != "var":
                        raise SparqlSyntaxError("ORDER BY needs ?var")
                    p.eat_punct(")")
                    spec["order_by"].append(
                        ("-" if tv == "desc" else "") + vv[1:])
                else:
                    break
            if not spec["order_by"]:
                raise SparqlSyntaxError("ORDER BY needs sort keys")
        elif p.at_kw("limit"):
            p.next()
            nk, nv = p.next()
            if nk != "num":
                raise SparqlSyntaxError("LIMIT needs an integer")
            spec["limit"] = int(nv)
        elif p.at_kw("offset"):
            p.next()
            nk, nv = p.next()
            if nk != "num":
                raise SparqlSyntaxError("OFFSET needs an integer")
            spec["offset"] = int(nv)
        else:
            break


def _path_relations(triples: DataFrame, g: dict):
    """Property-path patterns -> binding relations
    (operators/paths.py:path_match), joined into the BGP through
    bgp_match's ``relations`` hook."""
    from .paths import path_match

    return [path_match(triples, s, p, o) for s, p, o in g["paths"]]


def _subquery_relations(triples: DataFrame, g: dict,
                        graph_col: str = "graph"):
    """``{ SELECT … }`` subqueries -> binding relations: each is
    evaluated bottom-up (SPARQL 1.1 §12) as its own SELECT and
    joined into the enclosing group on shared variables through the
    same ``relations`` hook as property paths."""
    return [_exec_select(triples, sq, graph_col=graph_col)
            for sq in g.get("subqueries", ())]


def _exec_group(triples: DataFrame, g: dict,
                graph_col: str = "graph") -> DataFrame:
    if g["graphs"]:
        from .bgp import quad_match

        if (g["patterns"] or g["paths"] or g["unions"] or g["optional"]
                or g["minus"] or g["values"] or g["exists"]
                or g["not_exists"] or g["binds"] or g["subqueries"]):
            raise SparqlSyntaxError(
                "GRAPH queries in text form must scope EVERY pattern "
                "inside GRAPH blocks (default-graph semantics are "
                "store-specific; mixing is not supported)")
        if graph_col not in triples.columns:
            raise SparqlSyntaxError(
                "GRAPH query against a triple table without a %r "
                "column" % graph_col)
        quads = []
        filters = list(g["filters"])
        for gterm, pats, fls in g["graphs"]:
            quads.extend((gterm, s, p, o) for s, p, o in pats)
            filters.extend(fls)
        return quad_match(triples, quads, filters=filters,
                          graph_col=graph_col)
    if g["unions"]:
        if any(g[x] for x in
               ("patterns", "optional", "filters", "minus", "values",
                "exists", "not_exists", "binds", "paths",
                "subqueries")):
            raise SparqlSyntaxError(
                "UNION mixed with group-level modifiers is not "
                "supported in text form")
        return bgp_union(
            triples,
            [b["patterns"] for b in g["unions"]],
            filters=[b["filters"] for b in g["unions"]],
        )
    return bgp_match(
        triples, g["patterns"], optional=g["optional"],
        filters=g["filters"], minus=g["minus"], values=g["values"],
        exists=g["exists"], not_exists=g["not_exists"], binds=g["binds"],
        relations=_path_relations(triples, g)
        + _subquery_relations(triples, g, graph_col),
    )


def sparql_query(triples: DataFrame, text: str,
                 graph_col: str = "graph"):
    """Execute a SPARQL query STRING against a ``(subj, pred, obj)``
    triple DataFrame. SELECT/CONSTRUCT return a DataFrame; ASK
    returns a bool — the ``rdflib.Graph.query`` migration surface.
    ``GRAPH`` blocks (SELECT form, every pattern scoped) require the
    quad table's named-graph column, ``graph_col``."""
    spec = parse_query(text)
    g = spec["group"]
    if g is not None and g.get("graphs") and spec["form"] != "select":
        raise SparqlSyntaxError(
            "GRAPH blocks are supported in SELECT text queries only")
    if spec["form"] == "describe":
        from pyspark.sql import functions as F

        from .bgp import describe
        if spec["iri"] is not None:
            # concise bounded description of a named resource: one
            # pushed-down point filter on the subject column
            return triples.filter(
                F.col("subj") == spec["iri"]).dropDuplicates()
        return describe(triples, g["patterns"], spec["var"])
    if spec["form"] == "ask":
        if g["unions"]:
            return any(
                ask(triples, b["patterns"], filters=b["filters"])
                for b in g["unions"])
        return ask(triples, g["patterns"], optional=g["optional"],
                   filters=g["filters"], minus=g["minus"],
                   values=g["values"], exists=g["exists"],
                   not_exists=g["not_exists"], binds=g["binds"],
                   relations=_path_relations(triples, g)
                   + _subquery_relations(triples, g, graph_col))
    if spec["form"] == "construct":
        if (spec["order_by"] or spec["limit"] is not None
                or spec["offset"] or spec["group_by"] or spec["having"]):
            # SPARQL applies solution modifiers to the WHERE
            # solutions BEFORE template instantiation; slicing the
            # deduplicated output graph instead would be a silent
            # semantic divergence — refuse, pointing at the correct
            # composition
            raise SparqlSyntaxError(
                "CONSTRUCT with solution modifiers / grouping is not "
                "supported in text form — run the SELECT with the "
                "modifiers, then construct() from its rows")
        return construct(
            triples, g["patterns"], spec["template"],
            optional=g["optional"], filters=g["filters"],
            minus=g["minus"], values=g["values"], exists=g["exists"],
            not_exists=g["not_exists"], binds=g["binds"],
            relations=_path_relations(triples, g)
            + _subquery_relations(triples, g, graph_col))
    if spec["form"] == "update":
        return _exec_update(triples, spec)
    return _exec_select(triples, spec, graph_col=graph_col)


def _exec_select(triples: DataFrame, spec: dict,
                 graph_col: str = "graph") -> DataFrame:
    """Execute a parsed SELECT spec (top-level query or subquery)."""
    g = spec["group"]
    exprs = [(n, e) for n, e in spec["projection"] if e is not None]
    has_agg = bool(spec["group_by"]) or any(
        re.match(r"\s*(count|sum|min|max|avg|array_join)\s*\(", e,
                 re.IGNORECASE)
        for _, e in exprs)
    if has_agg:
        if spec["star"]:
            raise SparqlSyntaxError("SELECT * with aggregates")
        aggregates = {n: e for n, e in exprs}
        plain = [n for n, e in spec["projection"] if e is None]
        bad = [n for n in plain if n not in spec["group_by"]]
        if bad:
            raise SparqlSyntaxError(
                "projected variables %s are neither grouped nor "
                "aggregated" % bad)
        if g["graphs"]:
            raise SparqlSyntaxError(
                "GRAPH blocks with aggregates are not supported in "
                "text form")
        out = bgp_aggregate(
            triples, g["patterns"], group_by=spec["group_by"],
            aggregates=aggregates, having=spec["having"],
            optional=g["optional"], filters=g["filters"],
            minus=g["minus"], values=g["values"],
            exists=g["exists"], not_exists=g["not_exists"],
            binds=g["binds"],
            relations=_path_relations(triples, g)
            + _subquery_relations(triples, g, graph_col),
        )
        cols = [n for n, _ in spec["projection"]]
        out = out.select(*cols) if cols else out
    else:
        out = _exec_group(triples, g, graph_col=graph_col)
        if exprs:
            from pyspark.sql import functions as F

            from .bgp import _FILTER_VAR
            for n, e in exprs:
                out = out.withColumn(
                    n, F.expr(_FILTER_VAR.sub(r"`\1`", e)))
        if not spec["star"]:
            out = out.select(*[n for n, _ in spec["projection"]])
    return solution_modifiers(
        out, distinct=spec["distinct"], order_by=spec["order_by"],
        limit=spec["limit"], offset=spec["offset"])


def _exec_update(triples: DataFrame, spec: dict) -> DataFrame:
    """Execute a parsed update spec; returns the NEW triple table
    (the caller persists it — same functional contract as
    ``bgp.update_where``)."""
    from pyspark.sql import functions as F

    from .bgp import update_where

    key = ["subj", "pred", "obj"]
    if spec["data"]:
        pats = spec["delete" if spec["data"] == "delete" else "insert"]
        lit = triples.sparkSession.createDataFrame(
            [(s, p, o, bool(f)) for s, p, o, f in pats],
            "subj string, pred string, obj string, obj_is_uri boolean",
        )
        if spec["data"] == "delete":
            return triples.join(F.broadcast(lit.select(*key)),
                                on=key, how="left_anti")
        # INSERT DATA: set-semantics — already-present keys are no-ops
        ins = lit.select(*[
            (F.col(c) if c in lit.columns
             else F.lit(None).cast(triples.schema[c].dataType)).alias(c)
            for c in triples.columns
        ]).dropDuplicates(key)
        ins = ins.join(triples.select(*key), on=key, how="left_anti")
        return triples.unionByName(ins)
    g = spec["group"]
    if (g["unions"] or g["graphs"] or g["paths"] or g["subqueries"]
            or g["minus"] or g["values"] or g["binds"]
            or g["exists"] or g["not_exists"]):
        raise SparqlSyntaxError(
            "update WHERE groups support plain patterns, OPTIONAL "
            "and FILTERs only in text form")
    return update_where(
        triples, g["patterns"],
        delete=[(s, p, o) for s, p, o, _ in spec["delete"]],
        insert=spec["insert"],
        optional=g["optional"], filters=g["filters"],
    )
