"""Golden-vector tests for the per-datatype vectorizers."""

from math import cos, pi, sin

import numpy as np
import pytest

from mrgcn_tpu.data.rdf import IRI, Literal, xsd
from mrgcn_tpu.encodings.xsd import boolean, numeric, string, temporal
from mrgcn_tpu.encodings.ogc import wkt


P = IRI("http://x/p")
Q = IRI("http://x/q")


def _maps(literals, predicates=None):
    nodes_map = {}
    node_predicate_map = {}
    i = 0
    for lit in literals:
        nodes_map[lit] = i
        node_predicate_map[lit] = {predicates[i] if predicates else P}
        i += 1
    return nodes_map, node_predicate_map


# -- numeric ---------------------------------------------------------------

def test_numeric_scaling_minus1_to_1():
    lits = [Literal(str(v), datatype=xsd("integer")) for v in (0, 5, 10)]
    nm, npm = _maps(lits)
    sets = numeric.generate_features(nm, npm, {"datatype": "xsd.numeric"})
    assert len(sets) == 1
    enc, node_idx, lengths = sets[0]
    np.testing.assert_allclose(enc[:, 0], [-1.0, 0.0, 1.0])
    np.testing.assert_array_equal(node_idx, [0, 1, 2])


def test_numeric_constant_column_is_zero():
    lits = [Literal("7", datatype=xsd("int")),
            Literal("7.0", datatype=xsd("double"))]
    nm, npm = _maps(lits)
    sets = numeric.generate_features(nm, npm, {"datatype": "xsd.numeric"})
    enc = sets[0][0]
    np.testing.assert_allclose(enc[:, 0], 0.0)


def test_numeric_per_predicate_grouping():
    lits = [Literal("1", datatype=xsd("int")),
            Literal("2", datatype=xsd("int"))]
    nm, npm = _maps(lits, predicates=[P, Q])
    sets = numeric.generate_features(nm, npm, {"datatype": "xsd.numeric"})
    assert len(sets) == 2


def test_numeric_parse_failure_skipped():
    lits = [Literal("not-a-number", datatype=xsd("int")),
            Literal("3", datatype=xsd("int"))]
    nm, npm = _maps(lits)
    sets = numeric.generate_features(nm, npm, {"datatype": "xsd.numeric"})
    assert sets[0][0].shape[0] == 1


def test_numeric_concrete_subtype_filter():
    lits = [Literal("1", datatype=xsd("int")),
            Literal("2", datatype=xsd("double"))]
    nm, npm = _maps(lits)
    sets = numeric.generate_features(nm, npm, {"datatype": "xsd.double"})
    assert sets[0][0].shape[0] == 1


# -- boolean ---------------------------------------------------------------

def test_boolean_mapping():
    lits = [Literal(v, datatype=xsd("boolean"))
            for v in ("true", "false", "1", "0")]
    nm, npm = _maps(lits)
    sets = boolean.generate_features(nm, npm, {"datatype": "xsd.boolean"})
    enc = sets[0][0]
    np.testing.assert_allclose(enc[:, 0], [1.0, -1.0, 1.0, -1.0])


# -- temporal golden vectors -------------------------------------------------

def test_gyear_golden():
    # 1955: century=19, decade=5, year=5 (reference: gYear.py:84-98)
    lits = [Literal("1955", datatype=xsd("gYear")),
            Literal("1855", datatype=xsd("gYear"))]
    nm, npm = _maps(lits)
    sets = temporal.generate_features(nm, npm, {"datatype": "xsd.gYear"})
    enc = sets[0][0]
    assert enc.shape == (2, 6)
    rad = 2 * pi / 10
    # sign
    np.testing.assert_allclose(enc[:, 0], 1.0)
    # century normalised: 19 -> +1, 18 -> -1
    np.testing.assert_allclose(enc[:, 1], [1.0, -1.0])
    # decade/year circles
    np.testing.assert_allclose(enc[0, 2:4], [sin(5 * rad), cos(5 * rad)],
                               rtol=1e-6)
    np.testing.assert_allclose(enc[0, 4:6], [sin(5 * rad), cos(5 * rad)],
                               rtol=1e-6)


def test_gyear_bce_sign():
    lits = [Literal("-0044", datatype=xsd("gYear")),
            Literal("1900", datatype=xsd("gYear"))]
    nm, npm = _maps(lits)
    sets = temporal.generate_features(nm, npm, {"datatype": "xsd.gYear"})
    enc = sets[0][0]
    assert enc[0, 0] == -1.0 and enc[1, 0] == 1.0


def test_gyear_short_year_fails_like_reference():
    # reference drops 1-2 digit years: int('') of the century group raises
    # (reference: gYear.py:92)
    lits = [Literal("85", datatype=xsd("gYear")),
            Literal("1985", datatype=xsd("gYear"))]
    nm, npm = _maps(lits)
    sets = temporal.generate_features(nm, npm, {"datatype": "xsd.gYear"})
    assert sets[0][0].shape[0] == 1


def test_date_golden():
    lits = [Literal("1984-06-21", datatype=xsd("date")),
            Literal("2001-01-01", datatype=xsd("date"))]
    nm, npm = _maps(lits)
    sets = temporal.generate_features(nm, npm, {"datatype": "xsd.date"})
    enc = sets[0][0]
    assert enc.shape == (2, 10)
    month_rad, day_rad = 2 * pi / 12, 2 * pi / 31
    np.testing.assert_allclose(enc[0, 6:8],
                               [sin(6 * month_rad), cos(6 * month_rad)],
                               rtol=1e-6)
    np.testing.assert_allclose(enc[0, 8:10],
                               [sin(21 * day_rad), cos(21 * day_rad)],
                               rtol=1e-6)
    # centuries 19 vs 20 normalised to -1 / +1
    np.testing.assert_allclose(enc[:, 1], [-1.0, 1.0])


def test_datetime_golden():
    lits = [Literal("1984-06-21T13:30:00", datatype=xsd("dateTime"))]
    nm, npm = _maps(lits)
    sets = temporal.generate_features(nm, npm, {"datatype": "xsd.dateTime"})
    enc = sets[0][0]
    assert enc.shape == (1, 14)
    hour_rad, minute_rad = 2 * pi / 24, 2 * pi / 60
    np.testing.assert_allclose(enc[0, 10:12],
                               [sin(13 * hour_rad), cos(13 * hour_rad)],
                               rtol=1e-6)
    np.testing.assert_allclose(enc[0, 12:14],
                               [sin(30 * minute_rad), cos(30 * minute_rad)],
                               rtol=1e-6)
    # constant century -> 0
    assert enc[0, 1] == 0.0


# -- string ------------------------------------------------------------------

def test_string_byte_tokenizer():
    # xsd:string typed and language-tagged plain literals match; untyped
    # untagged literals do not (reference: string.py:106-108)
    lits = [Literal("hi", datatype=xsd("string")),
            Literal("welt", language="de"),
            Literal("ignored")]
    nm, npm = _maps(lits)
    sets = string.generate_features(nm, npm, {"datatype": "xsd.string"})
    enc, node_idx, lengths = sets[0]
    tok = string.ByteTokenizer()
    np.testing.assert_array_equal(
        enc[0], [tok.CLS, ord("h"), ord("i"), tok.SEP])
    assert lengths[0] == 4


def test_string_truncation():
    lits = [Literal("x" * 2000, datatype=xsd("string"))]
    nm, npm = _maps(lits)
    sets = string.generate_features(nm, npm, {"datatype": "xsd.string"})
    assert sets[0][2][0] == string.MAX_CHARS


def test_anyuri():
    lits = [Literal("http://example.org/x", datatype=xsd("anyURI"))]
    nm, npm = _maps(lits)
    sets = string.generate_features(nm, npm, {"datatype": "xsd.anyURI"})
    assert sets is not None and sets[0][0][0].shape[0] > 2


# -- WKT -----------------------------------------------------------------------

def test_wkt_point():
    vec = wkt.vectorize_wkt("POINT (4.3 52.1)")
    assert vec.shape == (1, 7)
    assert vec[0, 0] == pytest.approx(4.3)
    assert vec[0, 1] == pytest.approx(52.1)
    assert vec[0, -1] == 1.0  # full stop


def test_wkt_polygon():
    vec = wkt.vectorize_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    assert vec.shape == (4, 7)
    assert vec[-1, -1] == 1.0
    assert np.all(vec[:-1, -1] == 0.0)


def test_wkt_feature_layout():
    lit = Literal("POLYGON ((0 0, 10 0, 10 10, 0 0))",
                  datatype="http://www.opengis.net/ont/geosparql#wktLiteral")
    nm, npm = _maps([lit])
    sets = wkt.generate_features(nm, npm, {"datatype": "ogc.wktLiteral"})
    enc = sets[0][0]
    geometry = enc[0]
    assert geometry.shape[0] == 9  # 2 mean rows + 7 dims, time last
    # scaled coordinates are centred at rows 2:4
    assert abs(float(geometry[2, :].mean())) < 1.0


def test_wkt_max_points_cap():
    coords = ", ".join(f"{i} {i}" for i in range(200))
    vec = wkt.vectorize_wkt(f"LINESTRING ({coords})")[:wkt.MAX_POINTS]
    assert vec.shape[0] == wkt.MAX_POINTS
