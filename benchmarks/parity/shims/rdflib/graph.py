"""rdflib Graph shim: an N-Triples-backed triple set."""

from __future__ import annotations

import re
from typing import Iterator, Optional, Set, Tuple

from rdflib.term import BNode, Literal, URIRef

_ESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|([tbnrf\"'\\]))")
_ESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}

_TRIPLE_RE = re.compile(r"""
    ^[ \t]*
    (?:<(?P<s_iri>[^>]*)>|_:(?P<s_bnode>\S+))
    [ \t]+
    <(?P<p_iri>[^>]*)>
    [ \t]+
    (?:
        <(?P<o_iri>[^>]*)>
      | _:(?P<o_bnode>\S+)
      | "(?P<o_lex>(?:[^"\\]|\\.)*)"
        (?:@(?P<o_lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
          |\^\^<(?P<o_dtype>[^>]*)>
        )?
    )
    [ \t]*\.[ \t]*$
""", re.VERBOSE)


def _unescape(value: str) -> str:
    if "\\" not in value:
        return value

    def repl(m):
        u4, u8, c = m.groups()
        if u4 is not None:
            return chr(int(u4, 16))
        if u8 is not None:
            return chr(int(u8, 16))
        return _ESCAPE_MAP[c]

    return _ESCAPE_RE.sub(repl, value)


class Graph:
    def __init__(self, *args, **kwargs):
        self._triples: Set[Tuple] = set()

    # -- parsing ---------------------------------------------------------

    def parse(self, source, format: Optional[str] = None, **kwargs):
        if hasattr(source, "read"):
            data = source.read()
            if isinstance(data, bytes):
                data = data.decode("utf-8")
            lines = data.splitlines()
        else:
            with open(source, "r", encoding="utf-8") as f:
                lines = f.read().splitlines()
        for line in lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            m = _TRIPLE_RE.match(line)
            if m is None:
                continue
            g = m.groupdict()
            s = URIRef(_unescape(g["s_iri"])) if g["s_iri"] is not None \
                else BNode(g["s_bnode"])
            p = URIRef(_unescape(g["p_iri"]))
            if g["o_iri"] is not None:
                o = URIRef(_unescape(g["o_iri"]))
            elif g["o_bnode"] is not None:
                o = BNode(g["o_bnode"])
            else:
                o = Literal(_unescape(g["o_lex"]), g["o_lang"],
                            _unescape(g["o_dtype"]) if g["o_dtype"]
                            else None)
            self._triples.add((s, p, o))
        return self

    # -- access ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self._triples)

    def __iter__(self) -> Iterator[Tuple]:
        return iter(self._triples)

    def __contains__(self, triple) -> bool:
        return triple in self._triples

    def __isub__(self, other):
        self._triples -= set(other)
        return self

    def add(self, triple):
        self._triples.add(tuple(triple))
        return self

    def triples(self, pattern=(None, None, None)):
        ps, pp, po = pattern
        for s, p, o in self._triples:
            if ps is not None and s != ps:
                continue
            if pp is not None and p != pp:
                continue
            if po is not None and o != po:
                continue
            yield s, p, o

    def subjects(self, predicate=None, object=None):
        for s, p, o in self.triples((None, predicate, object)):
            yield s

    def predicates(self, subject=None, object=None):
        for s, p, o in self.triples((subject, None, object)):
            yield p

    def objects(self, subject=None, predicate=None):
        for s, p, o in self.triples((subject, predicate, None)):
            yield o

    # -- lifecycle (no-ops) ------------------------------------------------

    def destroy(self, store):
        pass

    def close(self, commit_pending_transaction=False):
        pass
