"""Training utilities: optimizer param groups, regularisation, early
stopping, checkpointing.

Counterpart of reference: mrgcn/tasks/utils.py plus the optimizer/penalty
glue that lives inline in the reference task drivers.
"""

from __future__ import annotations

import logging
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)

# Parameter leaves included in L1/L2 penalties and weight decay. The
# reference penalises every parameter whose torch name contains 'weight'
# (reference: node_classification.py:172-188): linear/conv kernels, BN
# scales, R-GCN weight matrices and basis coefficients, and the gate vector
# ('gate_weights' contains 'weight'); biases and the DistMult relation
# vectors are excluded.
_WEIGHT_LEAVES = {"kernel", "scale", "embedding", "pos_embedding",
                  "weight_i", "weight_i_packed", "weight_f", "comp_i",
                  "comp_f", "gate_weights"}


def weight_mask(params) -> Dict:
    """Pytree of booleans marking 'weight'-like parameters."""

    def mark(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name in _WEIGHT_LEAVES

    return jax.tree_util.tree_map_with_path(mark, params)


def regularization(params, l1_lambda: float, l2_lambda: float) -> jnp.ndarray:
    """L1/L2 penalty over weight-like parameters
    (reference: node_classification.py:172-188)."""
    if l1_lambda <= 0 and l2_lambda <= 0:
        return jnp.asarray(0.0, dtype=jnp.float32)
    mask = weight_mask(params)
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for leaf, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)):
        if not m:
            continue
        if l1_lambda > 0:
            total = total + l1_lambda * jnp.sum(jnp.abs(leaf))
        if l2_lambda > 0:
            total = total + l2_lambda * jnp.sum(leaf ** 2)
    return total


def _param_labels(params, optimizer_config: Dict, featureless: bool):
    """Group label per parameter: 'gates' for the gate vector, the datatype
    for encoder instances (name prefix, e.g. ``xsd_numeric_0`` ->
    ``xsd.numeric``), 'default' otherwise
    (reference: tasks/utils.py:8-45)."""
    datatype_labels = {k for k in optimizer_config if k != "gate_weights"}

    def label(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "gate_weights" and not featureless:
            return "gates"
        datatype = ".".join(top.split("_")[:2])
        if datatype in datatype_labels:
            return datatype
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def _scale_by_amsgrad_torch(b1: float, b2: float, eps: float):
    """torch-exact AMSGrad scaling: the running max is over the RAW second
    moment, bias-corrected afterwards (``optax.amsgrad`` maxes the
    bias-corrected value instead, which diverges as the correction term
    decays — pinned against torch in tests/test_trainer_utils.py)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"count": jnp.zeros([], jnp.int32), "mu": zeros,
                "nu": zeros, "nu_max": zeros}

    def update(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], updates)
        nu_max = jax.tree.map(jnp.maximum, state["nu_max"], nu)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm / bc2) + eps),
            mu, nu_max)
        return out, {"count": count, "mu": mu, "nu": nu, "nu_max": nu_max}

    return optax.GradientTransformation(init, update)


def _adam_like(lr: float, weight_decay: float, betas=(0.9, 0.999),
               eps: float = 1e-8, amsgrad: bool = False, params_mask=None):
    """torch ``optim.Adam(lr, weight_decay, betas, eps, amsgrad)``
    equivalence: decay is added to the gradient *before* the Adam moments;
    ``amsgrad`` keeps the running max of the second moment."""
    steps = []
    if weight_decay and weight_decay > 0:
        steps.append(optax.add_decayed_weights(weight_decay, params_mask))
    if amsgrad:
        steps.append(_scale_by_amsgrad_torch(float(betas[0]),
                                             float(betas[1]), float(eps)))
        steps.append(optax.scale(-lr))
    else:
        steps.append(optax.adam(lr, b1=float(betas[0]), b2=float(betas[1]),
                                eps=float(eps)))
    return optax.chain(*steps)


# per-group optimizer kwargs the reference forwards verbatim into
# ``torch.optim.Adam`` param groups (reference: tasks/utils.py:8-45 — any
# ``optim_*`` config key lands in the group dict)
_ADAM_KWARGS = {"lr", "weight_decay", "betas", "eps", "amsgrad"}


def _group_adam(cfg: Dict, base_lr: float, base_wd: float, label: str):
    unknown = set(cfg) - _ADAM_KWARGS
    if unknown:
        # torch param groups carry unknown keys without error (Adam's step
        # never reads them) — warn-ignore matches that
        logger.warning("Ignoring unsupported optim params for %s: %s "
                       "(supported: %s)", label, sorted(unknown),
                       sorted(_ADAM_KWARGS))
    return _adam_like(cfg.get("lr", base_lr),
                      cfg.get("weight_decay", base_wd),
                      betas=cfg.get("betas", (0.9, 0.999)),
                      eps=cfg.get("eps", 1e-8),
                      amsgrad=bool(cfg.get("amsgrad", False)))


def build_optimizer(params, config: Dict, optimizer_config: Dict,
                    featureless: bool) -> optax.GradientTransformation:
    """Global-norm clip (1.0, reference: node_classification.py:192) +
    per-group Adam with the reference's group structure."""
    base_lr = config["model"]["learning_rate"]
    base_wd = config["model"].get("weight_decay", 0.0)

    labels = _param_labels(params, optimizer_config or {}, featureless)
    present = set(jax.tree.leaves(labels))

    transforms = {"default": _adam_like(base_lr, base_wd)}
    if "gates" in present:
        gates_cfg = (optimizer_config or {}).get("gate_weights", {})
        transforms["gates"] = _group_adam(gates_cfg, base_lr, base_wd,
                                          "gate_weights")
    for datatype, cfg in (optimizer_config or {}).items():
        if datatype == "gate_weights" or datatype not in present:
            continue
        transforms[datatype] = _group_adam(cfg, base_lr, base_wd, datatype)

    for lbl in present:  # any label without explicit config -> default
        transforms.setdefault(lbl, _adam_like(base_lr, base_wd))

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(transforms, labels))


class EarlyStop:
    """Patience/tolerance early stopping with a warm-up delay, keeping the
    best parameters in host memory (reference: tasks/utils.py:47-90)."""

    def __init__(self, patience: int = 7, tolerance: float = 0.01,
                 delay: int = 10):
        self.tolerance = tolerance
        self.delay = delay
        self._patience_default = patience
        self.patience = patience
        self.stop = False
        self.best_score = -1.0
        self.best_state: Optional[Tuple] = None

    def record(self, score: float, state) -> None:
        if self.delay > 0:
            self.delay -= 1
            return

        if self.best_score < 0:
            self._update(score, state)
            return

        self.patience -= 1
        if (score + self.tolerance) < self.best_score:
            self._update(score, state)
            self.patience = self._patience_default
            self.stop = False

        if self.patience <= 0:
            self.stop = True

    def _update(self, score: float, state) -> None:
        self.best_score = score
        self.best_state = jax.tree.map(np.asarray, state)


def _flatten_state(tree, prefix: str, out: Dict) -> None:
    from flax import serialization
    sd = serialization.to_state_dict(tree)

    def walk(node, key):
        if isinstance(node, dict):
            if not node:
                # e.g. optax EmptyState: keep the empty node so the chain
                # structure survives the round trip
                out[f"{key}/__empty__"] = np.zeros(0, dtype=np.int8)
            for k, v in node.items():
                walk(v, f"{key}/{k}")
        else:
            out[key] = np.asarray(node)

    walk(sd, prefix)


def _unflatten_state(npz, prefix: str):
    root: Dict = {}
    for key in npz.files:
        if not key.startswith(prefix + "/"):
            continue
        parts = key[len(prefix) + 1:].split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] != "__empty__":
            node[parts[-1]] = npz[key]
    return root


def save_checkpoint(path: str, epoch: int, params, opt_state, batch_stats,
                    loss: float) -> None:
    """Persist ``{epoch, params, optimizer state, batch stats, loss}``
    (reference: run.py:230-236) as a **pickle-free** npz archive: loading
    never executes code, unlike the reference's torch.save format."""
    flat: Dict = {}
    _flatten_state(params, "params", flat)
    _flatten_state(opt_state, "opt_state", flat)
    _flatten_state(batch_stats, "batch_stats", flat)
    flat["meta/epoch"] = np.asarray(epoch, dtype=np.int64)
    flat["meta/loss"] = np.asarray(float(loss), dtype=np.float64)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def load_checkpoint(path: str) -> Dict:
    """Read an npz checkpoint (or a legacy pickle from earlier builds —
    logged, since unpickling executes arbitrary code).

    ``params``/``batch_stats`` come back as nested dicts (tree-mappable);
    ``opt_state`` is a nested state dict — restore it onto a freshly
    initialised optimizer state with :func:`restore_opt_state`.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # zip container: npz or a reference torch.save
        from mrgcn_tpu.tasks import torch_import
        if torch_import.is_torch_checkpoint(path):
            logger.info("%s is a reference torch checkpoint; importing "
                        "via tasks/torch_import (optimizer state is "
                        "re-initialised)", path)
            return torch_import.load_torch_checkpoint(path)
        npz = np.load(path, allow_pickle=False)
        return {
            "epoch": int(npz["meta/epoch"]),
            "loss": float(npz["meta/loss"]),
            "params": _unflatten_state(npz, "params"),
            "opt_state": _unflatten_state(npz, "opt_state"),
            "batch_stats": _unflatten_state(npz, "batch_stats"),
            "format": "npz",
        }
    logger.warning("%s is a legacy pickle checkpoint; loading it executes "
                   "code — prefer the npz format", path)
    with open(path, "rb") as f:
        state = pickle.load(f)
    state["format"] = "pickle"
    return state


# text-attention param-tree flavours a checkpoint can carry, keyed by a
# child key that appears only in that flavour's _TextBlock subtree, with
# the attn_impl values that produce the same tree. The 'auto' default
# changed in round 4 (flax MHA -> fused qkv/out Dense), so checkpoints
# saved under the old default need MRGCN_TEXT_ATTN=xla — detected here at
# load time instead of surfacing as an opaque tree mismatch mid-apply.
_ATTN_TREE_FLAVOURS = (
    # (marker key prefix, flavour name, compatible impls, auto-fix impl)
    ("MultiHeadDotProductAttention", "flax-MHA", ("xla", "flash"), "xla"),
    ("qkv", "fused-QKV", ("plain_fused", "fused_core", "auto"), None),
    ("query", "split-QKV", ("plain",), "plain"),
)


def _find_text_blocks(params, out):
    if not isinstance(params, dict):
        return
    for key, val in params.items():
        if key.startswith("_TextBlock_") and isinstance(val, dict):
            out.append(val)
        else:
            _find_text_blocks(val, out)


def reconcile_text_attn(params) -> Optional[str]:
    """Inspect a *loaded checkpoint's* text-encoder subtree and reconcile
    the text-attention impl with it BEFORE the model is built: RETURN a
    compatible impl for this model build when ``MRGCN_TEXT_ATTN`` is
    unset/'auto', fail with an explicit message when it is explicitly
    incompatible. Returns None (no override) for checkpoints without a
    from-scratch TextEncoder or when the env choice is already compatible.

    Deliberately does NOT write os.environ: the override applies to the
    model being restored only — a later model built in the same process
    (test suites, benchmark loops) must get the normal default (round-5
    review finding)."""
    import os
    blocks: list = []
    _find_text_blocks(params, blocks)
    if not blocks:
        return None
    flavour = None
    for marker, name, compatible, fix in _ATTN_TREE_FLAVOURS:
        if any(k.startswith(marker) for k in blocks[0]):
            flavour = (name, compatible, fix)
            break
    if flavour is None:
        return None
    name, compatible, fix = flavour
    current = os.environ.get("MRGCN_TEXT_ATTN", "auto")
    if current in compatible:
        return None
    if current == "auto" and fix is not None:
        logger.warning(
            "Checkpoint carries a %s text-attention param tree; "
            "selecting attn_impl=%s for this restore (the 'auto' "
            "default changed to the fused path)", name, fix)
        return fix
    raise RuntimeError(
        f"Checkpoint text-attention param tree is {name}, incompatible "
        f"with MRGCN_TEXT_ATTN={current}; set MRGCN_TEXT_ATTN="
        f"{fix or compatible[0]} to load it")


def restore_opt_state(template, stored):
    """Rebuild a typed optax state pytree from a loaded checkpoint:
    npz checkpoints store a plain nested state dict, pickle checkpoints the
    original pytree."""
    if isinstance(stored, dict) and not isinstance(template, dict):
        from flax import serialization
        return serialization.from_state_dict(template, stored)
    return jax.tree.map(jnp.asarray, stored)


def dead_encoders(model, params) -> tuple:
    """Encoder instances whose gate is exactly zero — the reference skips
    their forward at runtime (reference: mrgcn.py:263-268); on TPU the skip
    is compiled out statically via ``MRGCN.skip_encoders``."""
    gw = params.get("gate_weights") if isinstance(params, dict) else None
    if gw is None:
        return ()
    from mrgcn_tpu.models.mrgcn import module_names
    names = module_names(model.modules_config)
    vals = np.asarray(gw)
    return tuple(n for n, v in zip(names, vals[:len(names)])
                 if abs(float(v)) < 1e-12)


def with_gate_skip(model, params):
    """Rebuild the model with dead-gate encoders compiled out (no-op when
    every gate is live)."""
    dead = dead_encoders(model, params)
    if not dead:
        return model
    logger.info("Skipping zero-gated encoder(s): %s", ", ".join(dead))
    import dataclasses
    return dataclasses.replace(model, skip_encoders=dead)


class BatchProgress:
    """In-place terminal batch counter, the reference's training-loop
    progress display (reference: node_classification.py:157-161,
    link_prediction.py:231-235): prints `` [TRAIN] - batch  i / N`` and
    backspaces over it so the line is reused.

    Enabled only when the stream is a TTY (defaults to stdout) — log
    files and CI capture stay clean; the scan-batched epochs report per
    GROUP (one device dispatch covers many reference-batches)."""

    def __init__(self, total: int, stream=None, enabled: bool = None,
                 label: str = "TRAIN"):
        import sys
        self.total = int(total)
        self.stream = stream if stream is not None else sys.stdout
        if enabled is None:
            enabled = self.total > 1 and getattr(
                self.stream, "isatty", lambda: False)()
        self.enabled = enabled
        self.label = label

    def update(self, batch_id: int) -> None:
        if not self.enabled:
            return
        s = " [%s] - batch %2.d / %d" % (self.label, batch_id, self.total)
        self.stream.write(s + "\b" * len(s))
        self.stream.flush()

    def done(self) -> None:
        if not self.enabled:
            return
        s = " [%s] - batch %2.d / %d" % (self.label, self.total,
                                         self.total)
        self.stream.write(" " * len(s) + "\b" * len(s))
        self.stream.flush()
