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


def _adam_like(lr: float, weight_decay: float, params_mask=None):
    """torch ``optim.Adam(lr, weight_decay)`` equivalence: decay is added to
    the gradient *before* the Adam moments."""
    steps = []
    if weight_decay and weight_decay > 0:
        steps.append(optax.add_decayed_weights(weight_decay, params_mask))
    steps.append(optax.adam(lr))
    return optax.chain(*steps)


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
        transforms["gates"] = _adam_like(gates_cfg.get("lr", base_lr),
                                         gates_cfg.get("weight_decay",
                                                       base_wd))
    for datatype, cfg in (optimizer_config or {}).items():
        if datatype == "gate_weights" or datatype not in present:
            continue
        unknown = set(cfg) - {"lr", "weight_decay"}
        if unknown:
            logger.warning("Ignoring unsupported optim params for %s: %s",
                           datatype, sorted(unknown))
        transforms[datatype] = _adam_like(cfg.get("lr", base_lr),
                                          cfg.get("weight_decay", base_wd))

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
    if magic == b"PK":  # zip container: npz
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
