"""Link prediction: DistMult training + full-entity ranking evaluation.

Counterpart of reference: mrgcn/tasks/link_prediction.py. The training step
(forward, within-batch negative corruption, BCE, penalties, clip, Adam) is
one jitted XLA program; ranking evaluation computes node embeddings once and
scores every (fact, candidate-entity) pair with batched matmuls
(:mod:`mrgcn_tpu.ops.distmult`).

Parity notes:
  * negative sampling corrupts 20% of the batch, half heads / half tails,
    replacements drawn *within batch* (reference: link_prediction.py:246-264);
  * in test mode train+valid triple splits merge
    (reference: link_prediction.py:102-108);
  * evaluation splits facts into ``mrr_batchsize`` groups and averages
    per-group MRR/hits (reference: link_prediction.py:515-535, 416-420);
  * filtering uses the evaluated group's own facts as the true set,
    like the reference's per-batch truedicts
    (reference: link_prediction.py:595);
  * early stopping on ``1 - valid raw MRR`` at eval-interval cadence
    (reference: link_prediction.py:362-364).
"""

from __future__ import annotations

import logging
from time import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrgcn_tpu.data.artifact import Artifact
from mrgcn_tpu.encodings.features import construct_features
from mrgcn_tpu.models.mrgcn import MRGCN
from mrgcn_tpu.ops import distmult
from mrgcn_tpu.tasks import utils as tutils
from mrgcn_tpu.tasks.common import (RunInputs, hidden_dims_from_config,
                                    prepare_inputs)

logger = logging.getLogger(__name__)

K = (1, 3, 10)


def build_dataset(kg, nodes_map, config: Dict, featureless: bool):
    """Feature construction over the merged graph
    (reference: link_prediction.py:424-438)."""
    if featureless:
        return {}
    separate_literals = config["graph"]["structural"]["separate_literals"]
    return construct_features(nodes_map, kg, config["graph"]["features"],
                              separate_literals)


def build_model(inputs: RunInputs, config: Dict) -> MRGCN:
    hidden_dims = hidden_dims_from_config(config, None)
    return MRGCN(hidden_dims=hidden_dims,
                 modules_config=inputs.modules_config,
                 num_relations=inputs.num_relations,
                 num_nodes=inputs.num_nodes,
                 num_bases=config["model"]["num_bases"],
                 p_dropout=config["model"]["p_dropout"],
                 featureless=inputs.featureless,
                 use_bias=config["model"]["bias"],
                 link_prediction=True,
                 text_vocab_size=inputs.text_vocab_size,
                 text_pad_id=inputs.text_pad_id)


def make_train_step(model: MRGCN, optimizer, inputs: RunInputs, config: Dict,
                    data: np.ndarray, batch_nodes: np.ndarray):
    """One jitted epoch step: corrupt, score, BCE + penalties, update."""
    l1 = config["model"]["l1_lambda"]
    l2 = config["model"]["l2_lambda"]
    edges, features = inputs.edges, inputs.features

    num_samples = int(data.shape[0])
    ncorrupt = num_samples // 5  # corrupt 20% (reference: lp.py:248)
    nc_head = ncorrupt // 2
    nc_tail = ncorrupt - nc_head

    data_dev = jnp.asarray(data, dtype=jnp.int32)
    nodes_dev = jnp.asarray(batch_nodes, dtype=jnp.int32)
    labels = jnp.concatenate([jnp.ones(num_samples, dtype=jnp.float32),
                              jnp.zeros(ncorrupt, dtype=jnp.float32)])

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng):
        rng_pick, rng_head, rng_tail, rng_drop = jax.random.split(rng, 4)
        pick = jax.random.choice(rng_pick, num_samples, (ncorrupt,),
                                 replace=False)
        corrupted = data_dev[pick]
        corrupted = corrupted.at[:nc_head, 0].set(
            jax.random.choice(rng_head, nodes_dev, (nc_head,)))
        corrupted = corrupted.at[nc_head:, 2].set(
            jax.random.choice(rng_tail, nodes_dev, (nc_tail,)))
        triples = jnp.concatenate([data_dev, corrupted], axis=0)

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                features, edges, train=True,
                rngs={"dropout": rng_drop}, mutable=["batch_stats"])
            relations = p["rgcn"]["relations"]
            y_hat = distmult.score(triples[:, 0], triples[:, 1],
                                   triples[:, 2], out, relations)
            loss = optax.sigmoid_binary_cross_entropy(y_hat, labels).mean()
            loss = loss + tutils.regularization(p, l1, l2)
            return loss, updates.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return train_step


def make_embed_fn(model: MRGCN, inputs: RunInputs):
    edges, features = inputs.edges, inputs.features

    @jax.jit
    def embed(params, batch_stats):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           features, edges, train=False)

    return embed


def evaluate(data: np.ndarray, node_embeddings, relations,
             mrr_batchsize: int, filter_ranks: bool):
    """Grouped ranking evaluation with the reference's aggregation
    (reference: link_prediction.py:375-422)."""
    num_samples = data.shape[0]
    if mrr_batchsize <= 0:
        mrr_batchsize = num_samples
    groups = np.array_split(np.arange(num_samples),
                            max(num_samples // mrr_batchsize, 1))

    mrr = {"raw": [], "flt": []}
    hits = {"raw": [[] for _ in K], "flt": [[] for _ in K]}
    rankings = {"raw": [], "flt": []}
    for group in groups:
        gdata = data[group]
        raw, flt = distmult.compute_ranks(gdata, node_embeddings, relations,
                                          chunk_size=mrr_batchsize)
        for rank_type, ranks in (("raw", raw), ("flt", flt)):
            if rank_type == "flt" and not filter_ranks:
                mrr[rank_type].append(-1)
                for i in range(len(K)):
                    hits[rank_type][i].append(-1)
                rankings[rank_type].append([-1])
                continue
            m, h = distmult.mrr_hits(ranks, K)
            mrr[rank_type].append(m)
            for i in range(len(K)):
                hits[rank_type][i].append(h[i])
            rankings[rank_type].append(list(ranks))

    out_mrr = {t: float(np.mean(v)) for t, v in mrr.items()}
    out_hits = {t: [float(np.mean(k)) for k in hits[t]] for t in hits}
    out_ranks = {t: [r for group in rankings[t] for r in group]
                 for t in rankings}
    return out_mrr, out_hits, out_ranks


def run(artifact: Artifact, config: Dict, tsv_writer, featureless: bool,
        test_split: str, checkpoint: Optional[str], seed: int):
    header = ["epoch", "loss"]
    for split in ("train", "valid", "test"):
        header.extend([f"{split}_mrr_raw", f"{split}_H@1_raw",
                       f"{split}_H@3_raw", f"{split}_H@10_raw",
                       f"{split}_mrr_flt", f"{split}_H@1_flt",
                       f"{split}_H@3_flt", f"{split}_H@10_flt"])
    tsv_writer.writerow(header)

    inputs = prepare_inputs(artifact, config, featureless)
    featureless = inputs.featureless

    data = {k: np.asarray(v) for k, v in artifact.data.items()}
    if test_split == "test":
        # merge train and valid for training (reference: lp.py:102-108)
        data["train"] = np.concatenate([data["train"], data["valid"]],
                                       axis=0)
        data["valid"] = None

    model = build_model(inputs, config)

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    variables = model.init(init_rng, inputs.features, inputs.edges)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    optimizer = tutils.build_optimizer(params, config,
                                       inputs.optimizer_config, featureless)
    opt_state = optimizer.init(params)

    epoch = 0
    if checkpoint is not None:
        print("[LOAD] Loading model state", end="")
        state = tutils.load_checkpoint(checkpoint)
        params = jax.tree.map(jnp.asarray, state["params"])
        opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        batch_stats = jax.tree.map(jnp.asarray, state["batch_stats"])
        epoch = state["epoch"]
        print(f" - {epoch} epoch")

    train_data = data["train"]
    batch_nodes = np.union1d(train_data[:, 0], train_data[:, 2])
    train_step = make_train_step(model, optimizer, inputs, config,
                                 train_data, batch_nodes)
    embed_fn = make_embed_fn(model, inputs)

    nepoch = config["model"]["epoch"]
    eval_interval = config["task"]["eval_interval"]
    filter_ranks = config["task"]["filter_ranks"]
    mrr_batchsize = int(config["task"]["mrr_batchsize"])
    patience = config["task"]["early_stopping"]["patience"]
    tolerance = config["task"]["early_stopping"]["tolerance"]
    early_stop = tutils.EarlyStop(patience, tolerance) \
        if patience > 0 else None

    logger.info("Training for %d epoch", nepoch)
    t0 = time()
    loss = 0.0
    final_epoch = epoch
    for ep in range(epoch + 1, nepoch + epoch + 1):
        if early_stop is not None and early_stop.stop:
            logger.info("Stopping early after %d epoch", ep - 1)
            if early_stop.best_state is not None:
                params, opt_state, batch_stats = jax.tree.map(
                    jnp.asarray, early_stop.best_state)
            break
        final_epoch = ep

        rng, step_rng = jax.random.split(rng)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, step_rng)
        loss = float(loss)
        results_str = f"{ep:04d} | loss {loss:.4f}"

        train_mrr = train_hits = valid_mrr = valid_hits = None
        if ep % eval_interval == 0 or ep == nepoch + epoch:
            emb = embed_fn(params, batch_stats)
            relations = params["rgcn"]["relations"]
            train_mrr, train_hits, _ = evaluate(
                train_data, emb, relations, mrr_batchsize, filter_ranks)
            results_str += f" | train MRR {train_mrr['raw']:.4f} (raw)"
            if filter_ranks:
                results_str += f" / {train_mrr['flt']:.4f} (filtered)"

            if data["valid"] is not None and ep < nepoch + epoch:
                valid_mrr, valid_hits, _ = evaluate(
                    data["valid"], emb, relations, mrr_batchsize,
                    filter_ranks)
                results_str += f" | valid MRR {valid_mrr['raw']:.4f} (raw)"
                if filter_ranks:
                    results_str += f" / {valid_mrr['flt']:.4f} (filtered)"
                if early_stop is not None:
                    early_stop.record(1.0 - valid_mrr["raw"],
                                      (params, opt_state, batch_stats))
        logger.info(results_str)

        row: List = [str(ep), str(loss)]
        for mrr_d, hits_d in ((train_mrr, train_hits),
                              (valid_mrr, valid_hits)):
            if mrr_d is None:
                row.extend([-1] * 8)
            else:
                row.extend([str(mrr_d["raw"]), str(hits_d["raw"][0]),
                            str(hits_d["raw"][1]), str(hits_d["raw"][2]),
                            str(mrr_d["flt"]), str(hits_d["flt"][0]),
                            str(hits_d["flt"][1]), str(hits_d["flt"][2])])
        row.extend([-1] * 8)  # test placeholder
        tsv_writer.writerow(row)

    logger.info("Training time: %.2fs", time() - t0)

    # final test evaluation
    t0 = time()
    emb = embed_fn(params, batch_stats)
    relations = params["rgcn"]["relations"]
    test_mrr, test_hits, test_ranks = evaluate(
        data[test_split], emb, relations, mrr_batchsize, filter_ranks)
    logger.info("Testing time: %.2fs", time() - t0)

    row = [-1] * 18
    row.extend([str(test_mrr["raw"]), str(test_hits["raw"][0]),
                str(test_hits["raw"][1]), str(test_hits["raw"][2]),
                str(test_mrr["flt"]), str(test_hits["flt"][0]),
                str(test_hits["flt"][1]), str(test_hits["flt"][2])])
    tsv_writer.writerow(row)

    state = (params, opt_state, batch_stats)
    return state, final_epoch, loss, test_mrr, test_hits, test_ranks
