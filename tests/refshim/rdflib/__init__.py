# -*- coding: utf-8 -*-
"""Minimal rdflib-compatible shim used ONLY to *execute the reference
converters* (which import rdflib) for golden-fixture generation —
rdflib is not installed in this environment.

Implements just the surface the reference uses: URIRef / Literal /
Namespace as str subclasses, a set-semantics ConjunctiveGraph whose
``serialize`` writes one JSON object per triple (sorted), and the
standard namespace constants. Literal keeps ``lang``/``datatype`` and
copies them when re-wrapping a Literal (mirrors rdflib behaviour relied
on at pa_converter.py:397).
"""

import json


class URIRef(str):
    def __new__(cls, value):
        return str.__new__(cls, value)


class Literal(str):
    def __new__(cls, value, lang=None, datatype=None):
        if isinstance(value, Literal):
            if lang is None:
                lang = value.language
            if datatype is None:
                datatype = value.datatype
        obj = str.__new__(cls, value)  # str(None) -> 'None', as rdflib-ish
        obj.language = lang
        obj.datatype = datatype
        return obj

    def __eq__(self, other):
        if isinstance(other, Literal):
            return (
                str(self) == str(other)
                and self.language == other.language
                and self.datatype == other.datatype
            )
        if isinstance(other, URIRef):
            return False
        return str.__eq__(self, other)

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash((str(self), self.language, self.datatype))


class Namespace(str):
    def __new__(cls, value):
        return str.__new__(cls, value)

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(self + name)

    def __getitem__(self, key):
        return URIRef(self + key)

    # 'title' collides with str.title — rdflib special-cases it too
    @property
    def title(self):
        return URIRef(self + "title")


class ConjunctiveGraph:
    def __init__(self):
        self._triples = set()

    def bind(self, *a, **kw):
        pass

    def load(self, *a, **kw):  # pragma: no cover - unused by fixtures
        raise NotImplementedError

    def add(self, triplet):
        s, p, o = triplet
        key = (
            str(s),
            str(p),
            str(o),
            not isinstance(o, Literal),
            getattr(o, "language", None),
            str(o.datatype) if getattr(o, "datatype", None) else None,
        )
        self._triples.add(key)

    def serialize(self, path, format="turtle"):
        recs = sorted(
            self._triples,
            key=lambda t: (t[0], t[1], t[2], int(t[3]), t[4] or "", t[5] or ""),
        )
        with open(path, "w", encoding="utf-8") as fh:
            for s, p, o, is_uri, lang, dt in recs:
                fh.write(
                    json.dumps(
                        {
                            "s": s,
                            "p": p,
                            "o": o,
                            "o_is_uri": is_uri,
                            "lang": lang,
                            "datatype": dt,
                        },
                        ensure_ascii=False,
                    )
                    + "\n"
                )
