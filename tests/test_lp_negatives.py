"""LP negative-sample scheduling (``[task] negative_sampling_ratio`` /
``negative_adversarial_temperature``).

TPU-scale extension beyond the reference, which hardcodes uniform 1/5
within-batch corruption (reference: mrgcn/tasks/lp.py:246-268). These tests
pin (1) exact integer-count parity with the reference's ``n // 5`` at the
default ratio, (2) corruption-count / weight-mass behaviour across ratios
incl. the with-replacement path above 1.0, (3) driver bit-equality at the
defaults, and (4) that self-adversarial weighting is continuous at
temperature -> 0 and changes training at temperature > 0.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrgcn_tpu.config import apply_defaults
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.mkdataset import build
from mrgcn_tpu.tasks import link_prediction

from tests import synth


def test_ratio_quantization_matches_reference():
    """(n * 200) // 1000 == n // 5 for every count — the integer math the
    corruptor uses instead of float floors (which drift at FB15k scale)."""
    n = np.arange(0, 300_000, 13)
    np.testing.assert_array_equal((n * 200) // 1000, n // 5)


def _corrupt_once(ratio, M=64, num_triples=50, num_pool=30, seed=0):
    corrupt = link_prediction.make_corruptor(ratio)
    data = jnp.stack([jnp.arange(M, dtype=jnp.int32),
                      jnp.zeros(M, jnp.int32),
                      jnp.arange(M, dtype=jnp.int32) + 1000], axis=1)
    pool = jnp.arange(64, dtype=jnp.int32) + 5000   # recognisable ids
    return jax.jit(corrupt)(data, jnp.int32(num_triples), pool,
                            jnp.int32(num_pool), jax.random.PRNGKey(seed))


def test_default_ratio_counts_match_reference():
    triples, labels, weights = _corrupt_once(0.2, M=64, num_triples=50)
    assert triples.shape[0] == 64 + 64 // 5          # padded slots
    # real weighted rows: 50 positives + 50 // 5 negatives
    assert float(weights.sum()) == 50 + 50 // 5
    assert float((weights * (labels == 0)).sum()) == 50 // 5


@pytest.mark.parametrize("ratio", [0.0, 0.5, 1.0, 2.0])
def test_ratio_scales_negative_mass(ratio):
    triples, labels, weights = _corrupt_once(ratio, M=64, num_triples=50)
    ncp = int(64 * round(ratio * 1000)) // 1000
    assert triples.shape[0] == 64 + ncp
    n_real = min((50 * round(ratio * 1000)) // 1000, ncp)
    assert float((weights * (labels == 0)).sum()) == n_real
    assert float((weights * (labels == 1)).sum()) == 50
    # every corrupted row differs from its source in head xor tail, and the
    # replacement comes from the pool id range
    corr = np.asarray(triples[64:])
    if ncp:
        from_pool = (corr >= 5000)
        assert np.all(from_pool[:, 0] ^ from_pool[:, 2])
        assert not from_pool[:, 1].any()


def test_ratio_above_one_uses_replacement_over_real_rows():
    """ratio 2.0 on a padded batch: every corrupted row's surviving column
    must come from a REAL source row (id < num_triples), even though
    ncp > num_triples forces sampling with replacement."""
    triples, labels, weights = _corrupt_once(2.0, M=64, num_triples=20)
    corr = np.asarray(triples[64:])
    assert corr.shape[0] == 128
    heads_kept = corr[64:, 0]      # tail-corrupted rows keep the real head
    assert np.all(heads_kept < 20)
    tails_kept = corr[:64, 2] - 1000   # head-corrupted rows keep the tail
    assert np.all(tails_kept < 20)


def test_invalid_ratio_raises():
    with pytest.raises(ValueError):
        link_prediction.make_corruptor(-0.1)


@pytest.mark.parametrize("ratio,num_triples", [(1.0, 50), (0.5, 9), (0.2, 3)])
def test_weighted_negatives_source_real_rows(ratio, num_triples):
    """Regression: every WEIGHTED negative must be a corrupted copy of a
    REAL source row, and the weighted sources must be distinct (ratio <= 1).
    Before the fix, padded batches at num_triples < nc_head + n_real_tail
    routed (0, 0, 0) padding rows into weighted tail slots — the model
    trained on (0, 0, tail) garbage negatives at full weight."""
    triples, labels, weights = _corrupt_once(ratio, M=64,
                                             num_triples=num_triples)
    corr = np.asarray(triples[64:])
    w = np.asarray(weights[64:]).astype(bool)
    ncp = corr.shape[0]
    nc_head = ncp // 2
    # head-corrupted rows keep the real tail (source id + 1000); the tail
    # segment keeps the real head
    srcs = np.concatenate([corr[:nc_head, 2] - 1000, corr[nc_head:, 0]])
    assert np.all(srcs[w] < num_triples), srcs[w]
    assert len(np.unique(srcs[w])) == int(w.sum())   # distinct real rows


@pytest.fixture(scope="module")
def lp_artifact(tmp_path_factory):
    d = tmp_path_factory.mktemp("lp_neg")
    paths = synth.make_lp_dataset(str(d))
    config = apply_defaults(synth.lp_config(paths, epochs=8))
    A, F, Y, data, sample_map, class_map = build(config)
    path = str(d / "ds.npz")
    artifact_io.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                     class_map=class_map)
    return artifact_io.load(path), config


def _run_lp(art, config, **task_overrides):
    config = copy.deepcopy(config)
    config["task"].update(task_overrides)
    tsv = TSV("/dev/null", "w", dry_run=True)
    return link_prediction.run(art, config, tsv, featureless=True,
                               test_split="test", checkpoint=None, seed=7)


@pytest.mark.slow      # four driver runs; quick tier keeps the unit pins
def test_lp_driver_scheduling(lp_artifact):
    art, config = lp_artifact
    base = _run_lp(art, config)
    # explicit defaults are the same program: bit-equal loss and ranks
    explicit = _run_lp(art, config, negative_sampling_ratio=0.2,
                       negative_adversarial_temperature=0.0)
    assert base[2] == explicit[2]
    np.testing.assert_array_equal(base[5]["raw"], explicit[5]["raw"])
    # temperature -> 0+ is continuous with the uniform default
    eps = _run_lp(art, config, negative_adversarial_temperature=1e-9)
    np.testing.assert_allclose(eps[2], base[2], rtol=1e-4)
    # a real temperature + more negatives changes training and stays finite
    adv = _run_lp(art, config, negative_sampling_ratio=1.0,
                  negative_adversarial_temperature=1.0)
    assert np.isfinite(adv[2])
    assert adv[2] != base[2]
    assert 0.0 < adv[3]["raw"] <= 1.0
