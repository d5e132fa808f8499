"""JSON-LD reader tests (the documented fail-loud subset).

Reference capability: JSON-LD input via rdflib
(reference: mrgcn/data/io/knowledge_graph.py:45-56). mrgcn_tpu implements
a JSON-LD 1.0 subset in-tree (mrgcn_tpu/data/jsonld.py); everything
outside the subset must raise JsonLdError naming the construct — never
silently drop statements.
"""

import gzip
import json

import pytest

from mrgcn_tpu.data import jsonld
from mrgcn_tpu.data.jsonld import JsonLdError, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from mrgcn_tpu.data.kg import KnowledgeGraph
from mrgcn_tpu.data.rdf import IRI, BNode, Literal

XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://example.org/"


def P(doc):
    return set(jsonld.parse_text(json.dumps(doc)))


def test_expanded_form_basics():
    got = P({
        "@id": EX + "alice",
        "@type": EX + "Person",
        EX + "name": {"@value": "Alice", "@language": "en"},
        EX + "age": {"@value": 31, "@type": XSD + "integer"},
        EX + "knows": {"@id": EX + "bob"},
    })
    s = IRI(EX + "alice")
    assert (s, RDF_TYPE, IRI(EX + "Person")) in got
    assert (s, IRI(EX + "name"), Literal("Alice", language="en")) in got
    assert (s, IRI(EX + "age"),
            Literal("31", datatype=XSD + "integer")) in got
    assert (s, IRI(EX + "knows"), IRI(EX + "bob")) in got
    assert len(got) == 4


def test_context_terms_compact_iris_and_coercion():
    got = P({
        "@context": {
            "ex": EX,
            "name": "ex:name",
            "knows": {"@id": "ex:knows", "@type": "@id"},
            "born": {"@id": "ex:born", "@type": "xsd:gYear"},
            "xsd": XSD,
        },
        "@id": "ex:alice",
        "name": "Alice",
        "knows": "ex:bob",          # coerced to an IRI
        "born": "1990",             # coerced to a datatype
    })
    s = IRI(EX + "alice")
    assert (s, IRI(EX + "name"), Literal("Alice")) in got
    assert (s, IRI(EX + "knows"), IRI(EX + "bob")) in got
    assert (s, IRI(EX + "born"),
            Literal("1990", datatype=XSD + "gYear")) in got


def test_vocab_default_language_and_scalars():
    got = P({
        "@context": {"@vocab": EX, "@language": "nl"},
        "@id": EX + "x",
        "label": "fiets",
        "count": 7,
        "score": 2.5,
        "flag": True,
    })
    s = IRI(EX + "x")
    assert (s, IRI(EX + "label"), Literal("fiets", language="nl")) in got
    assert (s, IRI(EX + "count"),
            Literal("7", datatype=XSD + "integer")) in got
    assert (s, IRI(EX + "score"),
            Literal("2.5", datatype=XSD + "double")) in got
    assert (s, IRI(EX + "flag"),
            Literal("true", datatype=XSD + "boolean")) in got


def test_nested_nodes_arrays_and_bnodes():
    got = P({
        "@context": {"@vocab": EX},
        "@id": EX + "a",
        "knows": [
            {"@id": EX + "b", "name": "B"},
            {"name": "anon"},          # fresh blank node
        ],
    })
    a = IRI(EX + "a")
    assert (a, IRI(EX + "knows"), IRI(EX + "b")) in got
    assert (IRI(EX + "b"), IRI(EX + "name"), Literal("B")) in got
    anon = [o for s, p, o in got
            if p == IRI(EX + "knows") and isinstance(o, BNode)]
    assert len(anon) == 1
    assert (anon[0], IRI(EX + "name"), Literal("anon")) in got


def test_list_expansion():
    got = list(jsonld.parse_text(json.dumps({
        "@context": {"@vocab": EX, "seq": {"@id": EX + "seq",
                                           "@container": "@list"}},
        "@id": EX + "s",
        "seq": [1, 2],
    })))
    rest = {p for _, p, _ in got}
    assert RDF_FIRST in rest and RDF_REST in rest
    firsts = [o for _, p, o in got if p == RDF_FIRST]
    assert Literal("1", datatype=XSD + "integer") in firsts
    assert any(o == RDF_NIL for _, p, o in got if p == RDF_REST)


def test_graph_keyword_pools_statements():
    got = P({
        "@context": {"@vocab": EX},
        "@graph": [
            {"@id": EX + "a", "p": {"@id": EX + "b"}},
            {"@id": EX + "g1", "@graph": [
                {"@id": EX + "c", "p": {"@id": EX + "d"}}]},
        ],
    })
    assert (IRI(EX + "a"), IRI(EX + "p"), IRI(EX + "b")) in got
    assert (IRI(EX + "c"), IRI(EX + "p"), IRI(EX + "d")) in got
    # the graph label never appears as a subject of data triples
    assert not any(s == IRI(EX + "g1") for s, _, _ in got)


@pytest.mark.parametrize("doc,match", [
    ({"@context": "http://remote/ctx.jsonld", "@id": EX + "x"}, "remote"),
    ({"@context": {"@vocab": EX}, "@id": EX + "x",
      "@reverse": {"p": {"@id": EX + "y"}}}, "@reverse"),
    ({"@context": {"t": {"@id": EX + "t", "@container": "@index"}}},
     "@container"),
    ({"@id": EX + "x", EX + "v": {"@value": 1, "@type": "@json"}}, "@json"),
    ({"@id": "relative", EX + "p": {"@id": EX + "y"}}, "relative IRI"),
])
def test_unsupported_constructs_fail_loudly(doc, match):
    with pytest.raises(JsonLdError, match=match):
        jsonld.parse_text(json.dumps(doc))


def test_coercion_expansion_on_nonstring_scalars():
    """Regression (round-5 review): compact-IRI @type coercions must be
    EXPANDED for int/float/bool values too, and @id coercion on a
    non-string must not leak '@id' as a literal datatype."""
    got = P({
        "@context": {"xsd": XSD, "ex": EX,
                     "born": {"@id": "ex:born", "@type": "xsd:gYear"},
                     "knows": {"@id": "ex:knows", "@type": "@id"}},
        "@id": EX + "a",
        "born": 2000,
        "knows": True,       # nonsense input: keeps JSON boolean typing
    })
    assert (IRI(EX + "a"), IRI(EX + "born"),
            Literal("2000", datatype=XSD + "gYear")) in got
    assert (IRI(EX + "a"), IRI(EX + "knows"),
            Literal("true", datatype=XSD + "boolean")) in got


def test_vocab_term_definition_without_id():
    """Regression (round-5 review): @vocab + a coercion-only term
    definition ({'age': {'@type': ...}}) is spec-valid — the term
    expands against @vocab."""
    got = P({
        "@context": {"@vocab": EX, "xsd": XSD,
                     "age": {"@type": "xsd:integer"}},
        "@id": EX + "a",
        "age": "3",
    })
    assert (IRI(EX + "a"), IRI(EX + "age"),
            Literal("3", datatype=XSD + "integer")) in got


def test_list_container_wraps_single_value():
    """Regression (round-5 review): a @list-container term with a single
    non-array value expands to a one-element rdf list, not a plain
    triple."""
    got = list(jsonld.parse_text(json.dumps({
        "@context": {"seq": {"@id": EX + "seq", "@container": "@list"}},
        "@id": EX + "s",
        "seq": 1,
    })))
    objs = [o for s, p, o in got if p == IRI(EX + "seq")]
    assert len(objs) == 1 and isinstance(objs[0], BNode)
    assert (objs[0], RDF_FIRST,
            Literal("1", datatype=XSD + "integer")) in got
    assert (objs[0], RDF_REST, RDF_NIL) in got


def test_value_object_ignores_default_language_and_rejects_null():
    """Regression (round-5 review): explicit value objects do not inherit
    the context default language; @value: null fails loudly."""
    got = P({
        "@context": {"@language": "en", "@vocab": EX},
        "@id": EX + "a",
        "p": {"@value": "x"},
    })
    assert (IRI(EX + "a"), IRI(EX + "p"), Literal("x")) in got
    with pytest.raises(JsonLdError, match="null"):
        jsonld.parse_text(json.dumps(
            {"@id": EX + "a", EX + "p": {"@value": None}}))


def test_not_json_fails():
    with pytest.raises(JsonLdError, match="not valid JSON"):
        jsonld.parse_text("<rdf/>")


def test_jsonld_roundtrip_matches_ntriples_dataset(tmp_path):
    """The bundled classification context re-serialised as expanded
    JSON-LD parses to the IDENTICAL triple set (the /verify drive for
    this feature, pinned as a test)."""
    src = KnowledgeGraph("tests/tasks/classification/context.nt.gz")

    def ref(t):
        if isinstance(t, Literal):
            o = {"@value": str(t)}
            if t.language:
                o["@language"] = t.language
            elif t.datatype:
                o["@type"] = str(t.datatype)
            return o
        if isinstance(t, BNode):
            return {"@id": "_:" + str(t)}
        return {"@id": str(t)}

    nodes = {}
    for s, p, o in src.triples(separate_literals=False):
        sid = ("_:" + str(s)) if isinstance(s, BNode) else str(s)
        node = nodes.setdefault(sid, {"@id": sid})
        node.setdefault(str(p), []).append(ref(o))
    path = tmp_path / "ctx.jsonld.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump({"@graph": list(nodes.values())}, f)

    back = KnowledgeGraph(str(path))
    assert set(back.triples(separate_literals=False)) == \
        set(src.triples(separate_literals=False))


def test_kg_reads_jsonld_files(tmp_path):
    path = tmp_path / "g.jsonld.gz"
    with gzip.open(path, "wt") as f:
        json.dump({
            "@context": {"@vocab": EX},
            "@graph": [
                {"@id": EX + "a", "p": {"@id": EX + "b"}},
                {"@id": EX + "b", "p": {"@id": EX + "c"}},
            ],
        }, f)
    kg = KnowledgeGraph(str(path))
    assert len(kg) == 2
