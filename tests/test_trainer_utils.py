"""Trainer utilities: regularisation mask, optimizer groups, early stop."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mrgcn_tpu.tasks import utils as tutils


PARAMS = {
    "rgcn": {"layer_0": {"weight_i": jnp.ones((2, 3, 4)),
                         "comp_i": jnp.ones((5, 2)),
                         "bias": jnp.ones(4)},
             "relations": jnp.ones((5, 4))},
    "xsd_numeric_0": {"Dense_0": {"kernel": jnp.ones((3, 4)),
                                  "bias": jnp.ones(4)}},
    "gate_weights": jnp.full((2,), 0.1),
}


def test_regularization_includes_weightlike_only():
    # included: weight_i (24), comp_i (10), kernel (12), gate_weights (0.2)
    # excluded: biases, relations
    l1 = float(tutils.regularization(PARAMS, 1.0, 0.0))
    assert l1 == pytest.approx(24 + 10 + 12 + 0.2)


def test_regularization_zero_lambdas():
    assert float(tutils.regularization(PARAMS, 0.0, 0.0)) == 0.0


def test_param_labels_and_groups():
    config = {"model": {"learning_rate": 0.01, "weight_decay": 0.0}}
    optimizer_config = {"gate_weights": {"lr": 0.5},
                        "xsd.numeric": {"lr": 0.001, "momentum": 0.1}}
    opt = tutils.build_optimizer(PARAMS, config, optimizer_config,
                                 featureless=False)
    state = opt.init(PARAMS)
    grads = jax.tree.map(jnp.ones_like, PARAMS)
    updates, _ = opt.update(grads, state, PARAMS)
    # gates get lr 0.5, default 0.01, xsd.numeric 0.001 -> update magnitudes
    # reflect the group lrs (adam of constant grad -> ~lr)
    gate_mag = float(jnp.abs(updates["gate_weights"]).mean())
    default_mag = float(jnp.abs(
        updates["rgcn"]["layer_0"]["weight_i"]).mean())
    enc_mag = float(jnp.abs(
        updates["xsd_numeric_0"]["Dense_0"]["kernel"]).mean())
    assert gate_mag == pytest.approx(0.5, rel=0.05)
    assert default_mag == pytest.approx(0.01, rel=0.05)
    assert enc_mag == pytest.approx(0.001, rel=0.05)


def test_optimizer_featureless_no_gates_group():
    config = {"model": {"learning_rate": 0.01, "weight_decay": 0.0}}
    opt = tutils.build_optimizer(PARAMS, config, {}, featureless=True)
    # must initialise and update without error
    state = opt.init(PARAMS)
    grads = jax.tree.map(jnp.ones_like, PARAMS)
    opt.update(grads, state, PARAMS)


def test_early_stop_delay_and_patience():
    es = tutils.EarlyStop(patience=2, tolerance=0.0, delay=3)
    state = {"w": np.ones(1)}
    for _ in range(3):  # warm-up: nothing recorded
        es.record(1.0, state)
    assert es.best_state is None and not es.stop

    es.record(1.0, state)          # first real -> best
    assert es.best_score == 1.0
    es.record(0.5, {"w": np.full(1, 2.0)})  # improves -> reset
    assert es.best_score == 0.5
    es.record(0.6, state)          # worse
    es.record(0.7, state)          # worse again -> patience exhausted
    assert es.stop
    assert es.best_state["w"][0] == 2.0


def test_early_stop_tolerance_requires_margin():
    es = tutils.EarlyStop(patience=5, tolerance=0.1, delay=0)
    es.record(1.0, {})
    es.record(0.95, {})  # within tolerance -> not an improvement
    assert es.best_score == 1.0


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.pkl")
    params = {"a": np.arange(3.0)}
    opt_state = optax.adam(0.1).init(params)
    tutils.save_checkpoint(path, 7, params, opt_state, {}, 0.5)
    state = tutils.load_checkpoint(path)
    assert state["epoch"] == 7
    assert state["loss"] == 0.5
    np.testing.assert_array_equal(state["params"]["a"], [0, 1, 2])


def test_config_defaults():
    from mrgcn_tpu.config import apply_defaults
    cfg = apply_defaults({"graph": {"features": [
        {"datatype": "xsd.boolean", "include": True}]}})
    # the missing-embedding_dim defect in shipped configs is guarded
    assert cfg["graph"]["features"][0]["embedding_dim"] == 16
    assert cfg["model"]["num_bases"] == 0
    assert cfg["task"]["early_stopping"]["patience"] == -1


def test_npz_checkpoint_roundtrip_no_pickle(tmp_path):
    """Checkpoints are pickle-free npz; optimizer state (typed optax
    pytree incl. Adam moments) survives exactly via restore_opt_state."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mrgcn_tpu.tasks import utils as tutils

    params = {"layer": {"kernel": jnp.arange(6, dtype=jnp.float32
                                             ).reshape(2, 3),
                        "bias": jnp.ones((3,))}}
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(1e-2))
    opt_state = optimizer.init(params)
    # step once so the Adam moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = optimizer.update(grads, opt_state, params)
    stats = {"bn": {"mean": jnp.zeros((3,)) + 0.5}}

    path = str(tmp_path / "state.npz")
    tutils.save_checkpoint(path, epoch=7, params=params,
                           opt_state=opt_state, batch_stats=stats,
                           loss=0.25)

    with open(path, "rb") as f:
        assert f.read(2) == b"PK"  # zip (npz), not a pickle
    state = tutils.load_checkpoint(path)
    assert state["format"] == "npz"
    assert state["epoch"] == 7 and abs(state["loss"] - 0.25) < 1e-12

    p2 = jax.tree.map(jnp.asarray, state["params"])
    np.testing.assert_array_equal(np.asarray(p2["layer"]["kernel"]),
                                  np.asarray(params["layer"]["kernel"]))

    restored = tutils.restore_opt_state(optimizer.init(params),
                                        state["opt_state"])
    # same pytree structure (typed optax state) and identical leaves
    a = jax.tree_util.tree_structure(restored)
    b = jax.tree_util.tree_structure(opt_state)
    assert a == b
    for x, y in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_optim_kwargs_torch_adam_parity():
    """Per-group betas/eps/weight_decay/amsgrad reproduce
    ``torch.optim.Adam`` step for step (the reference forwards these
    verbatim into Adam param groups, reference: tasks/utils.py:8-45)."""
    import torch

    rng = np.random.default_rng(5)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32)
             for _ in range(5)]

    for amsgrad in (False, True):
        kw = dict(lr=0.01, betas=(0.7, 0.95), eps=1e-3, weight_decay=0.1)
        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = torch.optim.Adam([tw], amsgrad=amsgrad, **kw)
        for g in grads:
            tw.grad = torch.tensor(g)
            topt.step()

        opt = tutils._adam_like(kw["lr"], kw["weight_decay"],
                                betas=kw["betas"], eps=kw["eps"],
                                amsgrad=amsgrad)
        params = jnp.asarray(w0)
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update(jnp.asarray(g), state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params),
                                   tw.detach().numpy(), atol=1e-5)


def test_optim_group_kwargs_change_the_update():
    """A per-datatype ``optim_betas`` override changes that group's update
    while the default group is untouched."""
    config = {"model": {"learning_rate": 0.01, "weight_decay": 0.0}}

    def two_steps(optimizer_config):
        opt = tutils.build_optimizer(PARAMS, config, optimizer_config,
                                     featureless=False)
        params = PARAMS
        state = opt.init(params)
        for scale in (1.0, 0.25):  # betas only matter once grads vary
            grads = jax.tree.map(lambda x: scale * jnp.ones_like(x),
                                 params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return params

    base = two_steps({"xsd.numeric": {}})
    tuned = two_steps({"xsd.numeric": {"betas": [0.5, 0.9],
                                       "eps": 1e-4, "amsgrad": True}})
    k = lambda p: np.asarray(p["xsd_numeric_0"]["Dense_0"]["kernel"])
    d = lambda p: np.asarray(p["rgcn"]["layer_0"]["weight_i"])
    assert not np.allclose(k(base), k(tuned))
    np.testing.assert_array_equal(d(base), d(tuned))


def test_reconcile_text_attn_legacy_mha_autoselects_xla(monkeypatch):
    """The reconciled impl is RETURNED for the model being restored; the
    env must stay untouched so later builds in the same process get the
    normal default (round-5 review: a restored legacy checkpoint used to
    contaminate every subsequent model via os.environ)."""
    monkeypatch.delenv("MRGCN_TEXT_ATTN", raising=False)
    params = {"xsd_string_0": {"_TextBlock_0": {
        "MultiHeadDotProductAttention_0": {"query": {"kernel": 0}},
        "LayerNorm_0": {}}}}
    import os
    assert tutils.reconcile_text_attn(params) == "xla"
    assert "MRGCN_TEXT_ATTN" not in os.environ


def test_reconcile_text_attn_explicit_conflict_raises(monkeypatch):
    monkeypatch.setenv("MRGCN_TEXT_ATTN", "fused_core")
    params = {"xsd_string_0": {"_TextBlock_0": {
        "MultiHeadDotProductAttention_0": {"query": {"kernel": 0}}}}}
    with pytest.raises(RuntimeError, match="MRGCN_TEXT_ATTN=xla"):
        tutils.reconcile_text_attn(params)


def test_reconcile_text_attn_fused_tree_is_noop(monkeypatch):
    monkeypatch.delenv("MRGCN_TEXT_ATTN", raising=False)
    import os
    params = {"xsd_string_0": {"_TextBlock_0": {
        "qkv": {"kernel": 0}, "out": {"kernel": 0}}}}
    assert tutils.reconcile_text_attn(params) is None
    assert "MRGCN_TEXT_ATTN" not in os.environ
    # and a checkpoint without any text encoder never needs an override
    assert tutils.reconcile_text_attn({"rgcn": {"relations": 0}}) is None
    assert "MRGCN_TEXT_ATTN" not in os.environ
