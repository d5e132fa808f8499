import os

import pytest

from mrgcn_tpu.data.ntriples import parse_line, parse_file, NTriplesError
from mrgcn_tpu.data.rdf import IRI, BNode, Literal


def test_iri_triple():
    s, p, o = parse_line("<http://a> <http://b> <http://c> .")
    assert isinstance(s, IRI) and s == "http://a"
    assert isinstance(p, IRI) and p == "http://b"
    assert isinstance(o, IRI) and o == "http://c"


def test_bnode_subject_object():
    s, p, o = parse_line("_:b1 <http://p> _:b2 .")
    assert isinstance(s, BNode) and s == "b1"
    assert isinstance(o, BNode) and o == "b2"


def test_plain_literal():
    _, _, o = parse_line('<http://a> <http://p> "hello world" .')
    assert isinstance(o, Literal)
    assert str(o) == "hello world"
    assert o.language is None and o.datatype is None


def test_language_literal():
    _, _, o = parse_line('<http://a> <http://p> "bonjour"@fr .')
    assert o.language == "fr"


def test_datatyped_literal():
    _, _, o = parse_line(
        '<http://a> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .')
    assert o.datatype == "http://www.w3.org/2001/XMLSchema#int"
    assert str(o) == "42"


def test_escapes():
    _, _, o = parse_line(r'<http://a> <http://p> "tab\there\nnl é" .')
    assert str(o) == "tab\there\nnl é"


def test_quote_escape_in_literal():
    _, _, o = parse_line(r'<http://a> <http://p> "say \"hi\"" .')
    assert str(o) == 'say "hi"'


def test_malformed_raises():
    with pytest.raises(NTriplesError):
        parse_line("<http://a> <http://b>")


REF_NT = "/root/reference/tests/tasks/classification/context.nt.gz"


@pytest.mark.skipif(not os.path.exists(REF_NT),
                    reason="reference test data unavailable")
def test_parse_reference_dataset():
    triples = list(parse_file(REF_NT, strict=True))
    assert len(triples) > 1000
    # every triple term is well-formed
    for s, p, o in triples[:100]:
        assert isinstance(p, IRI)


def test_nquads_graph_label_ignored(tmp_path):
    """.nq files: the graph label is parsed and dropped (reference accepts
    any rdflib format incl. N-Quads; knowledge_graph.py:45-56)."""
    from mrgcn_tpu.data.kg import KnowledgeGraph
    from mrgcn_tpu.data.ntriples import parse_lines
    from mrgcn_tpu.data.rdf import IRI, Literal

    lines = [
        '<http://a/s> <http://a/p> <http://a/o> <http://a/g> .',
        '<http://a/s> <http://a/p> "lit"@en <http://a/g> .',
        '_:b <http://a/p> "x"^^<http://a/t> _:g .',
        '<http://a/s> <http://a/p> <http://a/o2> .',   # plain triple too
    ]
    out = list(parse_lines(lines, allow_quads=True))
    assert len(out) == 4
    assert out[0] == (IRI("http://a/s"), IRI("http://a/p"),
                      IRI("http://a/o"))
    assert out[1][2] == Literal("lit", "en")

    # plain .nt parsing must reject graph labels (skips them fail-soft),
    # matching the native C++ parser's triple count on the same file
    assert len(list(parse_lines(lines))) == 1

    p = tmp_path / "g.nq"
    p.write_text("\n".join(lines) + "\n")
    kg = KnowledgeGraph(str(p))
    assert len(list(kg.triples())) == 4
