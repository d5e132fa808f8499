import numpy as np
import pytest

from mrgcn_tpu.data.kg import KnowledgeGraph
from mrgcn_tpu.data.rdf import IRI, Literal
from mrgcn_tpu.encodings import structure


def _config(include_inverse=True, exclude=(), separate=False):
    return {"graph": {"structural": {
        "include_inverse_properties": include_inverse,
        "exclude_properties": list(exclude),
        "separate_literals": separate,
        "multiprocessing": False,
    }}}


@pytest.fixture
def tiny_kg():
    t = [
        (IRI("http://x/a"), IRI("http://x/p"), IRI("http://x/b")),
        (IRI("http://x/a"), IRI("http://x/p"), IRI("http://x/c")),
        (IRI("http://x/b"), IRI("http://x/q"), IRI("http://x/c")),
    ]
    return KnowledgeGraph(t)


def test_node_order_deterministic(tiny_kg):
    s, nodes_map, _ = structure.generate(tiny_kg, _config())
    names = [str(n) for n in nodes_map]
    assert names == sorted(names)
    assert s.num_nodes == 3


def test_kg_duplicate_add_is_noop():
    """Set semantics: re-adding an existing triple must not inflate the
    property distribution that property_frequency reads."""
    t = (IRI("http://x/a"), IRI("http://x/p"), IRI("http://x/b"))
    kg = KnowledgeGraph([t])
    kg.add(t)
    kg.add((IRI("http://x/a"), IRI("http://x/p"), IRI("http://x/c")))
    assert len(kg) == 2
    assert kg.property_frequency(IRI("http://x/p")) == 2


def test_shared_literal_tie_order_matches_atoms_oracle():
    """separate_literals=False with atoms whose str() ties (same lexical
    form, different datatype): node order must equal the stable sort of
    kg.atoms(False) encounter order — NOT set-iteration order, which
    depends on randomized str hashing across processes (round-5 review
    finding; reference groups ties by encounter order via quickSort,
    knowledge_graph.py:171-192)."""
    g_year = Literal("2000", datatype="http://www.w3.org/2001/XMLSchema#gYear")
    g_int = Literal("2000", datatype="http://www.w3.org/2001/XMLSchema#integer")
    plain = Literal("2000")
    t = [
        (IRI("http://x/a"), IRI("http://x/p"), g_int),
        (IRI("http://x/a"), IRI("http://x/q"), g_year),
        (IRI("http://x/b"), IRI("http://x/p"), plain),
        (IRI("http://x/b"), IRI("http://x/q"), g_int),
    ]
    kg = KnowledgeGraph(t)
    _, nodes_map, _ = structure.generate(kg, _config(separate=False))
    oracle = KnowledgeGraph.sort_atoms(kg.atoms(False))
    assert list(nodes_map) == oracle
    # all three str-tied "2000" atoms are distinct nodes, ordered as the
    # oracle orders them (kg triple encounter order, not hash order)
    ties = [n for n in nodes_map if str(n) == "2000"]
    assert len(ties) == 3
    assert ties == [n for n in oracle if str(n) == "2000"]


def test_relation_count_with_inverse(tiny_kg):
    s, _, props = structure.generate(tiny_kg, _config(include_inverse=True))
    # 2 properties * 2 (fwd+inv) + identity
    assert s.num_relations == 5
    assert len(props) == 2


def test_relation_count_without_inverse(tiny_kg):
    s, _, _ = structure.generate(tiny_kg, _config(include_inverse=False))
    assert s.num_relations == 3


def test_normalization_rows_sum_to_one(tiny_kg):
    s, nodes_map, _ = structure.generate(tiny_kg, _config())
    # within each relation, edge weights of each source row sum to 1
    key = s.rel.astype(np.int64) * s.num_nodes + s.src.astype(np.int64)
    sums = np.zeros(s.num_relations * s.num_nodes)
    np.add.at(sums, key, s.norm)
    nonzero = sums[sums > 0]
    np.testing.assert_allclose(nonzero, 1.0, rtol=1e-6)


def test_identity_relation_is_last(tiny_kg):
    s, _, _ = structure.generate(tiny_kg, _config())
    loop_mask = s.rel == s.num_relations - 1
    assert loop_mask.sum() == s.num_nodes
    np.testing.assert_array_equal(s.src[loop_mask], s.dst[loop_mask])
    np.testing.assert_allclose(s.norm[loop_mask], 1.0)


def test_matches_reference_hstack_layout(tiny_kg):
    """Dense comparison against a hand-built D^-1 A hstack
    (reference layout: graph_structure.py:38)."""
    s, nodes_map, _ = structure.generate(tiny_kg, _config())
    A = s.to_scipy_hstack().toarray()
    a, b, c = (nodes_map[IRI("http://x/" + x)] for x in "abc")
    n, R = s.num_nodes, s.num_relations
    # relation 0 = p forward: a->b, a->c; row a normalised by degree 2
    assert A[a, 0 * n + b] == pytest.approx(0.5)
    assert A[a, 0 * n + c] == pytest.approx(0.5)
    # relation 1 = p inverse: b->a, c->a with norm 1
    assert A[b, 1 * n + a] == pytest.approx(1.0)
    assert A[c, 1 * n + a] == pytest.approx(1.0)
    # relation 2 = q forward: b->c
    assert A[b, 2 * n + c] == pytest.approx(1.0)
    # identity last
    for i in range(n):
        assert A[i, (R - 1) * n + i] == pytest.approx(1.0)


def test_exclude_properties(tiny_kg):
    s, _, props = structure.generate(
        tiny_kg, _config(exclude=["http://x/q"]))
    assert s.num_relations == 3  # p fwd + inv + identity
    assert len(props) == 2  # properties_map still enumerates all


def test_separate_literals_unique_nodes():
    lit = Literal("5", datatype="http://www.w3.org/2001/XMLSchema#int")
    t = [
        (IRI("http://x/a"), IRI("http://x/p"), lit),
        (IRI("http://x/b"), IRI("http://x/p"), lit),
    ]
    kg = KnowledgeGraph(t)
    s_sep, _, _ = structure.generate(kg, _config(separate=True))
    s_shared, _, _ = structure.generate(kg, _config(separate=False))
    assert s_sep.num_nodes == 4   # a, b, and two unique literal nodes
    assert s_shared.num_nodes == 3


def test_pad_edges(tiny_kg):
    s, _, _ = structure.generate(tiny_kg, _config())
    padded = structure.pad_edges(s, multiple=64)
    assert padded.num_edges == 64
    assert np.all(padded.norm[s.num_edges:] == 0.0)


def test_kg_property_type_generators():
    from mrgcn_tpu.data.rdf import Literal, xsd as xsd_iri
    t = [
        (IRI("http://x/a"), IRI("http://x/knows"), IRI("http://x/b")),
        (IRI("http://x/a"), IRI("http://x/age"),
         Literal("5", datatype=xsd_iri("int"))),
        (IRI("http://x/b"), IRI("http://x/mixed"), IRI("http://x/c")),
        (IRI("http://x/c"), IRI("http://x/mixed"),
         Literal("x", datatype=xsd_iri("string"))),
    ]
    kg = KnowledgeGraph(t)
    ot = set(kg.objecttype_properties())
    dt = set(kg.datatype_properties())
    assert IRI("http://x/knows") in ot
    assert IRI("http://x/mixed") in ot     # mixed usage counts as objecttype
    assert IRI("http://x/age") in dt
    assert ot.isdisjoint(dt)

    terminals = set(kg.terminal_atoms())
    assert IRI("http://x/b") not in terminals  # also a subject
    assert any(isinstance(x, Literal) for x in terminals)
