"""Native C++ N-Triples parser: build + parity with the Python parser."""

import os

import pytest

from mrgcn_tpu.data import native
from mrgcn_tpu.data.ntriples import parse_file
from mrgcn_tpu.data.rdf import IRI, Literal


@pytest.fixture(scope="module")
def nt_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    path = str(d / "test.nt")
    with open(path, "w", encoding="utf-8") as f:
        f.write('<http://x/a> <http://x/p> <http://x/b> .\n')
        f.write('_:b1 <http://x/p> "plain lit" .\n')
        f.write('<http://x/a> <http://x/q> "bonjour"@fr .\n')
        f.write('<http://x/a> <http://x/q> '
                '"42"^^<http://www.w3.org/2001/XMLSchema#int> .\n')
        f.write('<http://x/a> <http://x/q> "esc\\t\\"q\\" \\u00e9" .\n')
        f.write('# comment line\n')
        f.write('malformed junk\n')
        f.write('<http://x/b> <http://x/p> <http://x/c> .\n')
    return path


def test_native_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no compiler available")
    assert lib is not None


def test_native_matches_python(nt_file):
    if native.get_lib() is None:
        pytest.skip("no compiler available")
    got = native.parse_file_native(nt_file)
    expected = list(parse_file(nt_file))
    assert got is not None
    assert len(got) == len(expected) == 6
    # same multiset of triples with identical term semantics
    assert set(map(repr, got)) == set(map(repr, expected))
    # term types survive
    lits = [o for _, _, o in got if isinstance(o, Literal)]
    assert any(o.language == "fr" for o in lits)
    assert any(o.datatype and o.datatype.endswith("#int") for o in lits)
    assert any("\t" in str(o) and "é" in str(o) for o in lits)


def test_native_interning_dedup(nt_file):
    if native.get_lib() is None:
        pytest.skip("no compiler available")
    got = native.parse_file_native(nt_file)
    subjects = [s for s, _, _ in got if s == IRI("http://x/a")]
    assert len(subjects) == 4


REF_NT = "/root/reference/tests/tasks/classification/context.nt.gz"


@pytest.mark.skipif(not os.path.exists(REF_NT),
                    reason="reference test data unavailable")
def test_native_gzip_parity():
    if native.get_lib() is None:
        pytest.skip("no compiler available")
    got = native.parse_file_native(REF_NT)
    expected = list(parse_file(REF_NT))
    assert len(got) == len(expected)
    assert set(map(repr, got)) == set(map(repr, expected))
