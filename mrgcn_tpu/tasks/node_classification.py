"""Node classification: dataset build + jitted training/eval drivers.

Counterpart of reference: mrgcn/tasks/node_classification.py, with the
training epoch compiled to a single XLA program (forward, CE loss, L1/L2
penalties, global-norm clip, Adam update).

Evaluation parity notes:
  * in test mode the train and validation label sets merge
    (reference: node_classification.py:117-124);
  * loss/accuracy are averaged *per batch* then over batches — identical to
    global means in full-batch mode (reference: node_classification.py:300-301);
  * early stopping tracks validation loss with the reference's
    patience/tolerance/10-epoch delay (reference: tasks/utils.py:47-90).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from time import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrgcn_tpu.data.artifact import Artifact
from mrgcn_tpu.encodings.features import construct_features
from mrgcn_tpu.models.mrgcn import MRGCN
from mrgcn_tpu.tasks import utils as tutils
from mrgcn_tpu.tasks.common import (RunInputs, hidden_dims_from_config,
                                    prepare_inputs)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# dataset build (mkdataset stage; reference: node_classification.py:312-383)
# ---------------------------------------------------------------------------

# dataset construction lives in tasks/build.py (jax-free for the ETL CLI);
# re-exported here under the reference's names
def build_dataset(kg, nodes_map, target_triples: Dict, config: Dict,
                  featureless: bool):
    from mrgcn_tpu.tasks.build import build_dataset_nc
    return build_dataset_nc(kg, nodes_map, target_triples, config,
                            featureless)


def mk_target_matrices(target_triples: Dict, nodes_map: Dict):
    from mrgcn_tpu.tasks.build import mk_target_matrices as _mk
    return _mk(target_triples, nodes_map)


# ---------------------------------------------------------------------------
# training driver (run stage)
# ---------------------------------------------------------------------------

def build_model(inputs: RunInputs, config: Dict, num_classes: int,
                mesh=None, text_attn=None) -> MRGCN:
    hidden_dims = hidden_dims_from_config(config, num_classes)
    mesh = mesh if mesh is not None \
        else getattr(inputs.edges, "mesh", None)
    return MRGCN(hidden_dims=hidden_dims,
                 text_attn_impl=text_attn,
                 modules_config=inputs.modules_config,
                 num_relations=inputs.num_relations,
                 num_nodes=inputs.num_nodes,
                 num_bases=config["model"]["num_bases"],
                 p_dropout=config["model"]["p_dropout"],
                 featureless=inputs.featureless,
                 use_bias=config["model"]["bias"],
                 text_vocab_size=inputs.text_vocab_size,
                 text_pad_id=inputs.text_pad_id,
                 under_mesh=mesh is not None, mesh=mesh)


def _loss_and_metrics(logits, idx, targets, weights):
    """Weighted CE/accuracy; padded label rows carry weight 0 so every batch
    bucket shape yields the reference's per-batch means."""
    picked = logits[idx]
    ce = optax.softmax_cross_entropy_with_integer_labels(picked, targets)
    total = jnp.maximum(jnp.sum(weights), 1.0)
    loss = jnp.sum(ce * weights) / total
    labels = jnp.argmax(picked, axis=1)
    acc = jnp.sum((labels == targets).astype(jnp.float32) * weights) / total
    return loss, acc, labels, targets


@dataclass
class NCBatch:
    """One training batch: graph slice + feature subset + padded labels."""

    features: Dict
    edges: object                # EdgeBlock or tuple of per-layer EdgeBlocks
    idx: jnp.ndarray             # (m,) output-row index per labelled node
    targets: jnp.ndarray         # (m,) class per labelled node
    weights: jnp.ndarray         # (m,) 1.0 real / 0.0 padding
    num_real: int = 0


def _pad_labels(idx, targets, bucket_min: int = 64):
    from mrgcn_tpu.data.batching import bucket
    m = len(idx)
    M = bucket(m, bucket_min)
    pad = M - m
    idx = np.concatenate([idx, np.zeros(pad, dtype=np.int32)])
    targets = np.concatenate([targets, np.zeros(pad, dtype=np.int32)])
    weights = np.concatenate([np.ones(m, dtype=np.float32),
                              np.zeros(pad, dtype=np.float32)])
    return (jnp.asarray(idx, dtype=jnp.int32),
            jnp.asarray(targets, dtype=jnp.int32), jnp.asarray(weights))


def make_batches(inputs: RunInputs, label_rows: np.ndarray, batchsize: int,
                 num_layers: int, fanout=None,
                 rng: Optional[np.random.Generator] = None) -> List[NCBatch]:
    """Full batch when ``batchsize <= 0`` or everything fits one slice;
    otherwise L-hop BFS mini-batches built once and reused every epoch
    (reference: node_classification.py:127-143, 329-351).

    ``fanout`` (``[task] neighbor_fanout``) caps each hop's per-node
    expansion with importance-rescaled norms (batching.hop_sampled) — a
    TPU-scale capability beyond the reference: batch shapes and HBM
    footprint stay bounded on graphs whose full L-hop neighbourhoods
    wouldn't fit."""
    num_samples = label_rows.shape[0]
    if batchsize <= 0 or batchsize >= num_samples:
        import os
        uniq, inverse = np.unique(label_rows[:, 0], return_inverse=True)
        # frontier-restricted layers: every layer aggregates only at the
        # rows the loss (transitively) reads — identical loss/gradients,
        # a fraction of the edge traffic (see
        # tasks/common.restricted_layer_edges). Under a mesh the
        # restricted chain is built with per-shard stacked layer-0 plans
        # and data-sharded edge/grouped arrays, so multi-chip NC runs the
        # same fast program as single-chip (round 3 skipped restriction
        # here and fell back to the full-edge program). Skipped only when
        # labels cover every node anyway.
        restrict = (os.environ.get("MRGCN_RESTRICT_OUT", "1") != "0"
                    and inputs.structure is not None
                    and len(uniq) < inputs.num_nodes)
        if restrict:
            from mrgcn_tpu.tasks.common import restricted_layer_edges
            edges = restricted_layer_edges(
                inputs.structure, uniq, num_layers, inputs.edges,
                first_dim=(inputs.hidden_dims[0]
                           if inputs.hidden_dims else None),
                X_width=inputs.X_width, featureless=inputs.featureless,
                identity_basis=inputs.identity_basis,
                mesh=getattr(inputs.edges, "mesh", None))
            idx, targets, weights = _pad_labels(inverse.astype(np.int32),
                                                label_rows[:, 1])
        else:
            edges = inputs.edges
            idx, targets, weights = _pad_labels(label_rows[:, 0],
                                                label_rows[:, 1])
        return [NCBatch(features=inputs.features, edges=edges,
                        idx=idx, targets=targets, weights=weights,
                        num_real=num_samples)]

    from mrgcn_tpu.data import batching
    index = batching.EdgeIndex(inputs.structure)
    batches = []
    for begin in range(0, num_samples, batchsize):
        rows = label_rows[begin:begin + batchsize]
        # a node may carry several labels (multi-label target triples);
        # sample its neighbourhood once and point every label row at the
        # same local output row
        uniq_nodes, inverse = np.unique(rows[:, 0], return_inverse=True)
        mb = batching.sample_minibatch(index, uniq_nodes, num_layers,
                                       fanout=fanout, rng=rng)
        feats = batching.subset_features(inputs.features, mb.outer_nodes,
                                         num_rows=mb.layer_edges[0].num_in)
        idx, targets, weights = _pad_labels(
            inverse.astype(np.int32), rows[:, 1])
        batches.append(NCBatch(features=feats, edges=mb.layer_edges,
                               idx=idx, targets=targets, weights=weights,
                               num_real=len(rows)))
    # one batched transfer for the whole split (see
    # batching.device_put_batches — per-array puts dominate build time on
    # remote-attached devices)
    put = batching.device_put_batches(
        [(b.features, b.edges, b.idx, b.targets, b.weights)
         for b in batches])
    return [NCBatch(features=f, edges=e, idx=i, targets=t, weights=wt,
                    num_real=b.num_real)
            for b, (f, e, i, t, wt) in zip(batches, put)]


def make_steps(model: MRGCN, optimizer, config: Dict):
    l1 = config["model"]["l1_lambda"]
    l2 = config["model"]["l2_lambda"]

    def _update(params, batch_stats, opt_state, features, edges, idx,
                targets, weights, rng):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                features, edges, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss, acc, _, _ = _loss_and_metrics(out, idx, targets, weights)
            loss = loss + tutils.regularization(p, l1, l2)
            return loss, (acc, updates.get("batch_stats", batch_stats))

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, acc

    # donate params / batch_stats / opt_state: they are consumed and
    # rebound every step, letting XLA update them in place
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, features, edges, idx,
                   targets, weights, rng):
        return _update(params, batch_stats, opt_state, features, edges,
                       idx, targets, weights, rng)

    # scan-batched mini-batch training: all same-shaped batches of an
    # epoch run as ONE device dispatch (lax.scan over the stacked batch
    # axis) instead of one dispatch per batch — per-batch dispatch
    # dominates small mini-batch steps (16.9 ms/batch at DMG scale,
    # benchmarks/minibatch_bench.py)
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_group(params, batch_stats, opt_state, stacked, rngs):
        def body(carry, xs):
            params, batch_stats, opt_state = carry
            (features, edges, idx, targets, weights), rng = xs
            params, batch_stats, opt_state, loss, acc = _update(
                params, batch_stats, opt_state, features, edges, idx,
                targets, weights, rng)
            return (params, batch_stats, opt_state), (loss, acc)

        (params, batch_stats, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, batch_stats, opt_state), (stacked, rngs))
        return params, batch_stats, opt_state, losses, accs

    @jax.jit
    def eval_step(params, batch_stats, features, edges, idx, targets,
                  weights):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          features, edges, train=False)
        return _loss_and_metrics(out, idx, targets, weights)

    @jax.jit
    def eval_group(params, batch_stats, stacked):
        def body(_, xs):
            features, edges, idx, targets, weights = xs
            return None, _loss_and_metrics(
                model.apply({"params": params,
                             "batch_stats": batch_stats},
                            features, edges, train=False),
                idx, targets, weights)

        _, out = jax.lax.scan(body, None, stacked)
        return out

    return train_step, eval_step, train_group, eval_group


def group_batches(batches: List[NCBatch]):
    """Group batches by identical pytree structure + leaf shapes/dtypes
    (bucketed sampling keeps the distinct-shape count small) and stack
    each group's leaves on a leading scan axis. Returns
    ``[(orig_indices, stacked_payload)]``."""
    groups: Dict = {}
    order: List = []
    for i, b in enumerate(batches):
        payload = (b.features, b.edges, b.idx, b.targets, b.weights)
        leaves, treedef = jax.tree.flatten(payload)
        key = (treedef, tuple((leaf.shape, str(leaf.dtype))
                              for leaf in leaves))
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((i, payload))
    out = []
    for key in order:
        members = groups[key]
        idxs = [i for i, _ in members]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[p for _, p in members])
        out.append((idxs, stacked))
    return out


def eval_batches(eval_step, params, batch_stats, batches: List[NCBatch]):
    """Per-batch means averaged over batches
    (reference: node_classification.py:229-310)."""
    pending = [eval_step(params, batch_stats, b.features, b.edges, b.idx,
                         b.targets, b.weights) for b in batches]
    losses, accs, labels_all, targets_all = [], [], [], []
    for b, (loss, acc, labels, targets) in zip(batches, pending):
        # all steps are dispatched above before the first blocking fetch
        losses.append(float(loss))
        accs.append(float(acc))
        labels_all.append(np.asarray(labels)[:b.num_real])
        targets_all.append(np.asarray(targets)[:b.num_real])
    return (float(np.mean(losses)), float(np.mean(accs)),
            np.concatenate(labels_all), np.concatenate(targets_all))


def eval_batches_grouped(eval_group, params, batch_stats,
                         batches: List[NCBatch], groups):
    """Scan-batched evaluation; outputs reassembled in original batch
    order so prediction TSVs keep the reference's row ordering."""
    n = len(batches)
    losses = [0.0] * n
    accs = [0.0] * n
    labels_all: List = [None] * n
    targets_all: List = [None] * n
    for idxs, stacked in groups:
        l, a, lab, tgt = eval_group(params, batch_stats, stacked)
        l, a = np.asarray(l), np.asarray(a)
        lab, tgt = np.asarray(lab), np.asarray(tgt)
        for j, i in enumerate(idxs):
            losses[i] = float(l[j])
            accs[i] = float(a[j])
            labels_all[i] = lab[j][:batches[i].num_real]
            targets_all[i] = tgt[j][:batches[i].num_real]
    return (float(np.mean(losses)), float(np.mean(accs)),
            np.concatenate(labels_all), np.concatenate(targets_all))


def run(artifact: Artifact, config: Dict, tsv_writer, featureless: bool,
        test_split: str, checkpoint: Optional[str], seed: int):
    """Full training + final evaluation; yields nothing, returns the result
    tuple mirroring the reference driver
    (reference: node_classification.py:25-110)."""
    tsv_writer.writerow(["epoch", "training_loss", "training_accurary",
                         "validation_loss", "validation_accuracy",
                         "test_loss", "test_accuracy"])

    inputs = prepare_inputs(artifact, config, featureless)
    featureless = inputs.featureless

    from mrgcn_tpu.parallel import mesh as pmesh
    mesh = pmesh.mesh_from_config(config)
    if mesh is not None:
        logger.info("Training under device mesh %s", dict(mesh.shape))
        inputs = pmesh.shard_inputs(mesh, inputs)

    Y = {k: np.asarray(v).reshape(-1, 2) for k, v in artifact.Y.items()}
    num_classes = len(artifact.class_map)

    Y_train, Y_valid = Y["train"], Y.get("valid")
    if test_split == "test" and Y_valid is not None:
        # merge train and validation labels when testing
        # (reference: node_classification.py:117-124)
        Y_train = np.concatenate([Y_train, Y_valid], axis=0)
        Y_valid = None

    # load any checkpoint BEFORE the model builds: the text-attention impl
    # (and with it the param-tree shape) is resolved at trace time, so a
    # checkpoint saved under a different default must pin it up front
    state = None
    text_attn = None
    if checkpoint is not None:
        state = tutils.load_checkpoint(checkpoint)
        if state.get("format") != "torch":
            text_attn = tutils.reconcile_text_attn(state["params"])

    model = build_model(inputs, config, num_classes, mesh=mesh,
                        text_attn=text_attn)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, inputs.features, inputs.edges)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh is not None:
        params = pmesh.shard_params(mesh, params)

    optimizer = tutils.build_optimizer(params, config,
                                       inputs.optimizer_config, featureless)
    opt_state = optimizer.init(params)

    epoch = 0
    if state is not None:
        print("[LOAD] Loading model state", end="")
        if state.get("format") == "torch":
            # reference-trained checkpoint: map the torch state dict onto
            # the initialised tree (tasks/torch_import); optimizer state
            # re-warms from scratch
            from mrgcn_tpu.tasks import torch_import
            p, bs, _ = torch_import.map_state_dict(
                state["model_state_dict"], model, params, batch_stats)
            params = jax.tree.map(jnp.asarray, p)
            batch_stats = jax.tree.map(jnp.asarray, bs)
        else:
            params = jax.tree.map(jnp.asarray, state["params"])
            opt_state = tutils.restore_opt_state(opt_state,
                                                 state["opt_state"])
            batch_stats = jax.tree.map(jnp.asarray, state["batch_stats"])
        epoch = state["epoch"]
        print(f" - {epoch} epoch")

    model = tutils.with_gate_skip(model, params)
    train_step, eval_step, train_group, eval_group = make_steps(
        model, optimizer, config)

    nepoch = config["model"]["epoch"]
    batchsize = config["task"].get("batchsize", -1)
    num_layers = len(model.hidden_dims)
    patience = config["task"]["early_stopping"]["patience"]
    tolerance = config["task"]["early_stopping"]["tolerance"]
    early_stop = tutils.EarlyStop(patience, tolerance) \
        if patience > 0 else None

    # neighbour-sampled training (TPU-scale extension; the reference always
    # expands full L-hop neighbourhoods): [task] neighbor_fanout caps each
    # hop's per-node expansion with importance-rescaled norms, bounding
    # batch shapes / HBM on graphs beyond full-expansion reach;
    # neighbor_fanout_rounds R > 1 pre-builds R independent samples and
    # cycles them across epochs (GraphSAGE-style variance reduction with
    # static shapes — bucket sizes repeat, so programs are reused)
    from mrgcn_tpu.data import batching as _batching
    fanout_cfg = config["task"].get("neighbor_fanout")
    fanout = None
    if batchsize > 0 and Y_train.shape[0] > batchsize:
        fanout = _batching.normalize_fanout(fanout_cfg, num_layers)
    elif fanout_cfg not in (None, -1):
        logger.warning("neighbor_fanout is ignored in full-batch mode "
                       "(set [task] batchsize > 0 to enable sampling)")
    rounds = max(1, int(config["task"].get("neighbor_fanout_rounds", 1))) \
        if fanout is not None else 1
    sample_rng = np.random.default_rng(seed)

    # batches are built once and reused every epoch
    # (reference: node_classification.py:127-143); evaluation batches always
    # expand fully — metrics stay exact, sampling is a training estimator
    train_rounds = [make_batches(inputs, Y_train, batchsize, num_layers,
                                 fanout=fanout, rng=sample_rng)
                    for _ in range(rounds)]
    train_batches = train_rounds[0]
    valid_batches = make_batches(inputs, Y_valid, batchsize, num_layers) \
        if Y_valid is not None else []

    # scan-batched mini-batch epochs: one device dispatch per shape group
    # instead of one per batch (MRGCN_SCAN_BATCHES=0 restores the
    # reference's strictly sequential per-batch order)
    import os as _os
    use_scan = (_os.environ.get("MRGCN_SCAN_BATCHES", "1") != "0"
                and len(train_batches) > 1)
    train_group_rounds = [group_batches(b) if use_scan else None
                          for b in train_rounds]
    train_groups = train_group_rounds[0]
    valid_groups = group_batches(valid_batches) \
        if use_scan and len(valid_batches) > 1 else None

    logger.info("Training for %d epoch (%d batch(es)%s)", nepoch,
                len(train_batches),
                f", {len(train_groups)} scan group(s)"
                if train_groups else "")
    t0 = time()
    final_epoch = epoch
    for ep in range(epoch + 1, nepoch + epoch + 1):
        if early_stop is not None and early_stop.stop:
            logger.info("Stopping early after %d epoch", ep - 1)
            if early_stop.best_state is not None:
                params, opt_state, batch_stats = jax.tree.map(
                    jnp.asarray, early_stop.best_state)
            break
        final_epoch = ep
        if rounds > 1:
            ri = (ep - 1) % rounds
            train_batches = train_rounds[ri]
            train_groups = train_group_rounds[ri]

        losses, accs = [], []
        if train_groups is not None:
            # in-place terminal progress, per scan GROUP (one dispatch
            # covers many reference-batches;
            # reference: node_classification.py:157-161)
            progress = tutils.BatchProgress(len(train_groups),
                                            label="TRAIN")
            for gi, (idxs, stacked) in enumerate(train_groups, 1):
                progress.update(gi)
                rng, key = jax.random.split(rng)
                rngs = jax.random.split(key, len(idxs))
                params, batch_stats, opt_state, l, a = train_group(
                    params, batch_stats, opt_state, stacked, rngs)
                losses.extend(np.asarray(l).tolist())
                accs.extend(np.asarray(a).tolist())
            progress.done()
        else:
            progress = tutils.BatchProgress(len(train_batches),
                                            label="TRAIN")
            for bi, b in enumerate(train_batches, 1):
                progress.update(bi)
                rng, step_rng = jax.random.split(rng)
                params, batch_stats, opt_state, loss, acc = train_step(
                    params, batch_stats, opt_state, b.features, b.edges,
                    b.idx, b.targets, b.weights, step_rng)
                losses.append(float(loss))
                accs.append(float(acc))
            progress.done()
        train_loss, train_acc = float(np.mean(losses)), float(np.mean(accs))

        val_loss, val_acc = -1.0, -1.0
        if valid_batches:
            if valid_groups is not None:
                val_loss, val_acc, _, _ = eval_batches_grouped(
                    eval_group, params, batch_stats, valid_batches,
                    valid_groups)
            else:
                val_loss, val_acc, _, _ = eval_batches(eval_step, params,
                                                       batch_stats,
                                                       valid_batches)
            logger.info("%04d | train loss %.4f / acc %.4f "
                        "| val loss %.4f / acc %.4f",
                        ep, train_loss, train_acc, val_loss, val_acc)
            if early_stop is not None:
                early_stop.record(val_loss,
                                  (params, opt_state, batch_stats))
        else:
            logger.info("%04d | train loss %.4f / acc %.4f",
                        ep, train_loss, train_acc)

        tsv_writer.writerow([str(ep), str(train_loss), str(train_acc),
                             str(val_loss), str(val_acc), "-1", "-1"])

    logger.info("Training time: %.2fs", time() - t0)

    # final test evaluation
    test_batches = make_batches(inputs, Y[test_split], batchsize,
                                num_layers)
    loss, acc, labels, targets = eval_batches(eval_step, params,
                                              batch_stats, test_batches)
    logger.info("Performance on %s set: loss %.4f / accuracy %.4f",
                test_split, loss, acc)
    tsv_writer.writerow(["-1", "-1", "-1", "-1", "-1", str(loss), str(acc)])

    state = (params, opt_state, batch_stats)
    return state, final_epoch, loss, acc, labels, targets
