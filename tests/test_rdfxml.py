"""RDF/XML parser tests.

The reference ingests any rdflib-supported serialisation
(reference: mrgcn/data/io/knowledge_graph.py:45-56); RDF/XML is the classic
OWL/legacy format. These tests cover the grammar constructs real datasets
use and the KnowledgeGraph dispatch (.rdf/.owl/.xml[.gz]).
"""

import gzip

import pytest

from mrgcn_tpu.data import rdfxml
from mrgcn_tpu.data.kg import KnowledgeGraph
from mrgcn_tpu.data.rdf import IRI, BNode, Literal

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EX = "http://example.org/ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

HEADER = ('<?xml version="1.0"?>\n'
          '<rdf:RDF xmlns:rdf="%s" xmlns:ex="%s"' % (RDF, EX))


def wrap(body, base=None):
    base_attr = f' xml:base="{base}"' if base else ""
    return f"{HEADER}{base_attr}>\n{body}\n</rdf:RDF>"


def parse(body, base=None):
    return rdfxml.parse_text(wrap(body, base))


def test_typed_node_and_literal():
    ts = parse('<ex:Person rdf:about="http://a/alice">'
               '<ex:name>Alice</ex:name></ex:Person>')
    assert (IRI("http://a/alice"), IRI(RDF + "type"),
            IRI(EX + "Person")) in ts
    assert (IRI("http://a/alice"), IRI(EX + "name"),
            Literal("Alice")) in ts


def test_description_resource_and_datatype():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:knows rdf:resource="http://a/y"/>'
               f'<ex:age rdf:datatype="{XSD}integer">30</ex:age>'
               '</rdf:Description>')
    assert (IRI("http://a/x"), IRI(EX + "knows"), IRI("http://a/y")) in ts
    assert (IRI("http://a/x"), IRI(EX + "age"),
            Literal("30", None, XSD + "integer")) in ts


def test_language_inheritance_and_override():
    ts = parse('<rdf:Description rdf:about="http://a/x" xml:lang="en">'
               '<ex:a>hello</ex:a><ex:b xml:lang="nl">hallo</ex:b>'
               '</rdf:Description>')
    objs = {str(p): o for _, p, o in ts}
    assert objs[EX + "a"] == Literal("hello", "en")
    assert objs[EX + "b"] == Literal("hallo", "nl")


def test_base_resolution_and_rdf_id():
    ts = parse('<rdf:Description rdf:about="alice">'
               '<ex:knows rdf:resource="bob"/></rdf:Description>'
               '<rdf:Description rdf:ID="carol"><ex:x>1</ex:x>'
               '</rdf:Description>',
               base="http://base.org/dir/")
    subs = {str(s) for s, _, _ in ts}
    assert "http://base.org/dir/alice" in subs
    assert "http://base.org/dir/#carol" in subs
    assert (IRI("http://base.org/dir/alice"), IRI(EX + "knows"),
            IRI("http://base.org/dir/bob")) in ts


def test_node_id_links_subjects():
    ts = parse('<rdf:Description rdf:nodeID="b"><ex:n>x</ex:n>'
               '</rdf:Description>'
               '<rdf:Description rdf:about="http://a/x">'
               '<ex:knows rdf:nodeID="b"/></rdf:Description>')
    bnode = next(s for s, p, _ in ts if str(p) == EX + "n")
    assert isinstance(bnode, BNode)
    assert (IRI("http://a/x"), IRI(EX + "knows"), bnode) in ts


def test_nested_node_element():
    ts = parse('<ex:A rdf:about="http://a/x"><ex:child>'
               '<ex:B rdf:about="http://a/y"><ex:n>y</ex:n></ex:B>'
               '</ex:child></ex:A>')
    assert (IRI("http://a/x"), IRI(EX + "child"), IRI("http://a/y")) in ts
    assert (IRI("http://a/y"), IRI(RDF + "type"), IRI(EX + "B")) in ts
    assert (IRI("http://a/y"), IRI(EX + "n"), Literal("y")) in ts


def test_parsetype_resource():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:addr rdf:parseType="Resource">'
               '<ex:city>Delft</ex:city></ex:addr></rdf:Description>')
    inner = next(o for _, p, o in ts if str(p) == EX + "addr")
    assert isinstance(inner, BNode)
    assert (inner, IRI(EX + "city"), Literal("Delft")) in ts


def test_parsetype_collection():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:items rdf:parseType="Collection">'
               '<rdf:Description rdf:about="http://a/1"/>'
               '<rdf:Description rdf:about="http://a/2"/>'
               '</ex:items></rdf:Description>')
    head = next(o for _, p, o in ts if str(p) == EX + "items")
    firsts = {s: o for s, p, o in ts if str(p) == RDF + "first"}
    rests = {s: o for s, p, o in ts if str(p) == RDF + "rest"}
    assert firsts[head] == IRI("http://a/1")
    assert firsts[rests[head]] == IRI("http://a/2")
    assert rests[rests[head]] == IRI(RDF + "nil")


def test_empty_collection_is_nil():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:items rdf:parseType="Collection"/></rdf:Description>')
    assert (IRI("http://a/x"), IRI(EX + "items"), IRI(RDF + "nil")) in ts


def test_parsetype_literal_xml():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:bio rdf:parseType="Literal">a <b>bold</b> b</ex:bio>'
               '</rdf:Description>')
    lit = next(o for _, p, o in ts if str(p) == EX + "bio")
    assert lit.datatype == RDF + "XMLLiteral"
    assert "<b>bold</b>" in lit.lexical


def test_container_li_numbering():
    ts = parse('<rdf:Seq rdf:about="http://a/seq">'
               '<rdf:li>one</rdf:li><rdf:li>two</rdf:li></rdf:Seq>')
    assert (IRI("http://a/seq"), IRI(RDF + "_1"), Literal("one")) in ts
    assert (IRI("http://a/seq"), IRI(RDF + "_2"), Literal("two")) in ts


def test_property_attributes_on_node():
    ts = parse('<ex:Person rdf:about="http://a/x" ex:nick="Al"/>')
    assert (IRI("http://a/x"), IRI(EX + "nick"), Literal("Al")) in ts


def test_property_attributes_on_empty_property():
    ts = parse('<rdf:Description rdf:about="http://a/x">'
               '<ex:addr ex:city="Delft"/></rdf:Description>')
    inner = next(o for _, p, o in ts if str(p) == EX + "addr")
    assert isinstance(inner, BNode)
    assert (inner, IRI(EX + "city"), Literal("Delft")) in ts


def test_malformed_xml_raises():
    with pytest.raises(rdfxml.RDFXMLError):
        rdfxml.parse_text("this is not XML at all")
    with pytest.raises(rdfxml.RDFXMLError):
        parse('<rdf:Description rdf:about="a" rdf:nodeID="b"/>')


def test_kg_dispatch_rdf_owl_xml(tmp_path):
    doc = wrap('<ex:Person rdf:about="http://a/alice">'
               '<ex:name>Alice</ex:name></ex:Person>')
    for name in ("g.rdf", "g.owl", "g.xml"):
        p = tmp_path / name
        p.write_text(doc)
        kg = KnowledgeGraph(str(p))
        assert len(list(kg.triples())) == 2

    gz = tmp_path / "g.rdf.gz"
    gz.write_bytes(gzip.compress(doc.encode()))
    kg = KnowledgeGraph(str(gz))
    assert len(list(kg.triples())) == 2


def test_kg_dispatch_bad_rdfxml_fails_loud(tmp_path):
    p = tmp_path / "bad.rdf"
    p.write_text("garbage that is not xml")
    with pytest.raises(rdfxml.RDFXMLError):
        KnowledgeGraph(str(p))


def test_equivalence_with_ntriples(tmp_path):
    """The same tiny graph through RDF/XML and N-Triples produces the
    same triple set (bnode labels normalised away)."""
    from mrgcn_tpu.data.ntriples import parse_file as nt_parse
    xml_doc = wrap('<ex:Person rdf:about="http://a/alice" ex:nick="Al">'
                   f'<ex:age rdf:datatype="{XSD}integer">30</ex:age>'
                   '<ex:knows rdf:resource="http://a/bob"/>'
                   '<ex:name xml:lang="en">Alice</ex:name></ex:Person>')
    nt_doc = "\n".join([
        f'<http://a/alice> <{RDF}type> <{EX}Person> .',
        f'<http://a/alice> <{EX}nick> "Al" .',
        f'<http://a/alice> <{EX}age> "30"^^<{XSD}integer> .',
        f'<http://a/alice> <{EX}knows> <http://a/bob> .',
        f'<http://a/alice> <{EX}name> "Alice"@en .',
    ])
    xp = tmp_path / "g.rdf"
    xp.write_text(xml_doc)
    np_ = tmp_path / "g.nt"
    np_.write_text(nt_doc + "\n")
    assert set(rdfxml.parse_file(str(xp))) == set(nt_parse(str(np_)))
