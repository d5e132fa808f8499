"""Feature assembly: dispatch, merges, noise, outliers, densify."""

import numpy as np
import pytest

from mrgcn_tpu.encodings import features
from mrgcn_tpu.encodings.xsd_hierarchy import XSDHierarchy


def _ragged(arrays, dtype=None):
    out = np.empty(len(arrays), dtype=object)
    for i, a in enumerate(arrays):
        out[i] = np.asarray(a, dtype=dtype)
    return out


# -- hierarchy & dispatch ----------------------------------------------------

def test_hierarchy_numeric_supertype():
    h = XSDHierarchy()
    for t in ("int", "long", "short", "byte", "decimal", "double", "float",
              "nonNegativeInteger", "unsignedByte", "negativeInteger"):
        assert h.subtypeof("numeric", t), t


def test_hierarchy_non_subtypes():
    h = XSDHierarchy()
    assert not h.subtypeof("numeric", "string")
    assert not h.subtypeof("gYear", "date")
    assert h.subtypeof("string", "token")


def test_feature_module_resolution():
    h = XSDHierarchy()
    assert features.feature_module(h, "xsd.numeric") == "xsd.numeric"
    assert features.feature_module(h, "xsd.int") == "xsd.numeric"
    assert features.feature_module(h, "xsd.nonNegativeInteger") == \
        "xsd.numeric"
    assert features.feature_module(h, "ogc.wktLiteral") == "ogc.wktLiteral"
    assert features.feature_module(h, "xsd.gMonth") is None
    assert features.feature_module(h, "custom.thing") is None


# -- weight-sharing merges ---------------------------------------------------

def test_merge_continuous_averages_duplicates():
    set_a = [np.array([[1.0], [2.0]], dtype=np.float32),
             np.array([5, 7], dtype=np.int32), np.ones(2)]
    set_b = [np.array([[3.0]], dtype=np.float32),
             np.array([5], dtype=np.int32), np.ones(1)]
    merged = features.merge_continuous_sets([set_a, set_b])
    assert len(merged) == 1
    enc, idx, _ = merged[0]
    np.testing.assert_array_equal(idx, [5, 7])
    # node 5 appears in both sets: mean of 1.0 and 3.0
    np.testing.assert_allclose(enc[:, 0], [2.0, 2.0])


def test_merge_discrete_majority_vote():
    set_a = [_ragged([[1, 2, 3]]), np.array([9], dtype=np.int32),
             np.array([3])]
    set_b = [_ragged([[1, 5, 3, 7]]), np.array([9], dtype=np.int32),
             np.array([4])]
    set_c = [_ragged([[1, 5, 9]]), np.array([9], dtype=np.int32),
             np.array([3])]
    merged = features.merge_discrete_sets([set_a, set_b, set_c])
    enc, idx, lengths = merged[0]
    assert lengths[0] == 4  # longest wins
    voted = enc[0]
    assert voted[0] == 1           # unanimous
    assert voted[1] == 5           # 2 of 3
    assert voted[2] == 3           # 2 of 3
    assert voted[3] == 7           # only entry with length 4


def test_merge_geometry_pads_and_averages():
    g1 = np.ones((9, 4), dtype=np.float32)
    g2 = 3 * np.ones((9, 2), dtype=np.float32)
    set_a = [_ragged([g1], dtype=np.float32), np.array([2], dtype=np.int32), np.array([4])]
    set_b = [_ragged([g2], dtype=np.float32), np.array([2], dtype=np.int32), np.array([2])]
    merged = features.merge_geometry_sets([set_a, set_b])
    enc, idx, lengths = merged[0]
    assert lengths[0] == 4
    g = enc[0]
    np.testing.assert_allclose(g[:, :2], 2.0)   # (1+3)/2 where both exist
    np.testing.assert_allclose(g[:, 2:], 0.5)   # (1+0)/2 where only g1


def test_merge_images_averages():
    imgs_a = np.full((1, 3, 4, 4), 100, dtype=np.uint8)
    imgs_b = np.full((1, 3, 4, 4), 200, dtype=np.uint8)
    set_a = [imgs_a, np.array([1], dtype=np.int32), -np.ones(1)]
    set_b = [imgs_b, np.array([1], dtype=np.int32), -np.ones(1)]
    merged = features.merge_image_sets([set_a, set_b])
    enc, idx, _ = merged[0]
    assert enc[0, 0, 0, 0] == 150


def test_single_set_merge_is_identity():
    s = [[np.ones((2, 3), dtype=np.float32), np.array([0, 1]), np.ones(2)]]
    assert features.merge_continuous_sets(s) is s


# -- noise & outliers ---------------------------------------------------------

def test_add_noise_changes_values():
    np.random.seed(0)
    enc = np.zeros((50, 4), dtype=np.float32)
    sets = [[enc, np.arange(50), np.ones(50)]]
    features.add_noise_(sets, p_noise=1.0, multiplier=0.5)
    assert np.abs(sets[0][0]).max() > 0
    assert np.abs(sets[0][0]).max() <= 0.5


def test_trim_outliers_tokens_keep_final_token():
    base = [list(range(k)) for k in (4, 5, 5, 5, 6, 6, 7, 8)]
    seqs = _ragged(base + [list(range(100))])
    lengths = np.array([len(s) for s in base] + [100])
    trimmed, _, new_lengths = features.trim_outliers(
        seqs, np.arange(9), lengths, time_axis=0)
    assert new_lengths[-1] < 100
    assert trimmed[-1][-1] == 99  # reference keeps the final token


def test_remove_outliers_drops_rows():
    seqs = _ragged([[1] * 5] * 8 + [[1] * 500] + [[2] * 6] * 3)
    lengths = np.array([5] * 8 + [500] + [6] * 3)
    kept, idx, new_lengths = features.remove_outliers(
        seqs, np.arange(12), lengths)
    assert len(kept) == 11
    assert 500 not in new_lengths


def test_remove_outliers_no_iqr_is_identity():
    seqs = np.empty(2, dtype=object)
    seqs[0] = np.array([1, 2])
    seqs[1] = np.array([3, 4])
    out = features.remove_outliers(seqs, np.array([0, 1]),
                                   np.array([2, 2]))
    assert len(out[0]) == 2


# -- densify -------------------------------------------------------------------

def test_densify_tokens_pad_symbol():
    X = [np.empty((4, 0)),
         ["xsd.string", [[_ragged([[1, 2], [3]]), np.array([0, 1]),
                          np.array([2, 1])]]]]
    out = features.densify(X, pad_symbols={"xsd.string": 99})
    dense = out[1][1][0][0]
    np.testing.assert_array_equal(dense, [[1, 2], [3, 99]])


def test_densify_rejects_duplicate_node_indices():
    # one feature row per node per set is the gather-only placement's
    # precondition (ops/placement.place_rows); densify fails loudly
    X = [np.empty((4, 0)),
         ["xsd.numeric", [[np.ones((3, 1), np.float32),
                           np.array([2, 2, 5]), np.array([1, 1, 1])]]]]
    with pytest.raises(ValueError, match="duplicate node indices"):
        features.densify(X)


def test_densify_geometry_min_length():
    X = [np.empty((4, 0)),
         ["ogc.wktLiteral", [[_ragged([np.ones((9, 5))]), np.array([0]),
                              np.array([5])]]]]
    out = features.densify(X, min_lengths={"ogc.wktLiteral": 20})
    dense = out[1][1][0][0]
    assert dense.shape == (1, 9, 20)
    assert dense[0, 0, 4] == 1.0 and dense[0, 0, 5] == 0.0


def test_stack_encoding_sets():
    set_a = [np.array([[1.0, 2.0]], dtype=np.float32),
             np.array([3], dtype=np.int32), np.array([2.0])]
    set_b = [np.array([[5.0]], dtype=np.float32),
             np.array([7], dtype=np.int32), np.array([1.0])]
    merged = features.stack_encoding_sets([set_a, set_b])
    enc, idx, lengths = merged[0]
    assert enc.shape == (2, 3)
    np.testing.assert_array_equal(idx, [3, 7])
    np.testing.assert_allclose(enc[0], [1.0, 2.0, 0.0])  # node 3: a only
    np.testing.assert_allclose(enc[1], [0.0, 0.0, 5.0])  # node 7: b only
