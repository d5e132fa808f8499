"""Minimal rdflib-compatible shim (N-Triples only).

Lets the *reference* implementation run in this environment (rdflib is not
installed) so its metrics can be compared against mrgcn_tpu on identical
synthetic data. Implements exactly the surface the reference touches:
``Graph`` (parse/triples/predicates/objects/subjects/len/iter/-=),
``URIRef``/``BNode``/``Literal`` terms with ``neq``, ``Namespace`` and
``util.guess_format``. Not a general RDF library.
"""

from rdflib.graph import Graph
from rdflib.namespace import Namespace, XSD
from rdflib.term import BNode, Literal, URIRef

__all__ = ["Graph", "Namespace", "XSD", "BNode", "Literal", "URIRef"]
