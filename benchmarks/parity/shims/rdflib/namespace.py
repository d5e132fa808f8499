"""rdflib namespace shim."""

from rdflib.term import URIRef


class Namespace(str):
    def __getattr__(self, name: str) -> URIRef:
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(str(self) + name)

    def __getitem__(self, name: str) -> URIRef:
        return URIRef(str(self) + name)


XSD = Namespace("http://www.w3.org/2001/XMLSchema#")
