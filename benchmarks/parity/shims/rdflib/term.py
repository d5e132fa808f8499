"""rdflib term shim: URIRef, BNode, Literal (str subclasses, rdflib-like)."""

from __future__ import annotations


class _Node(str):
    __slots__ = ()

    def eq(self, other) -> bool:
        return self == other

    def neq(self, other) -> bool:
        return self != other


class URIRef(_Node):
    __slots__ = ()

    def n3(self) -> str:  # pragma: no cover
        return f"<{self}>"


class BNode(_Node):
    __slots__ = ()


class Literal(str):
    """str subclass carrying language / datatype, like rdflib.

    Signature matches rdflib's positional use
    ``Literal(value, language, datatype, normalize=None)``.
    """

    def __new__(cls, value, lang=None, datatype=None, normalize=None):
        self = super().__new__(cls, value)
        self.language = lang
        self.datatype = URIRef(datatype) if datatype is not None else None
        return self

    def eq(self, other) -> bool:
        return self == other

    def neq(self, other) -> bool:
        return self != other

    def __eq__(self, other):
        if isinstance(other, Literal):
            return (str(self) == str(other)
                    and self.language == other.language
                    and self.datatype == other.datatype)
        if isinstance(other, str):
            return str(self) == other
        return NotImplemented

    def __hash__(self):
        return hash((str(self), self.language, self.datatype))

    def __repr__(self):  # pragma: no cover
        if self.language:
            return f"rdflib.term.Literal({str(self)!r}, lang={self.language!r})"
        if self.datatype:
            return (f"rdflib.term.Literal({str(self)!r}, "
                    f"datatype=rdflib.term.URIRef({str(self.datatype)!r}))")
        return f"rdflib.term.Literal({str(self)!r})"
