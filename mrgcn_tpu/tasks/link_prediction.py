"""Link prediction: DistMult training + full-entity ranking evaluation.

Counterpart of reference: mrgcn/tasks/link_prediction.py. The training step
(forward, BCE over positive + corrupted triples, penalties, clip, Adam) is a
jitted XLA program; ranking evaluation computes node embeddings once per
batch and scores every (fact, candidate) pair with batched matmuls
(:mod:`mrgcn_tpu.ops.distmult`).

Batching semantics mirror the reference (reference: lp.py:477-548):
  * ``gcn_batchsize`` slices the *nodes* appearing in the triple split; each
    slice collects every triple with a batch node as head or tail (triples
    may appear in <=2 batches);
  * each slice is sub-split into pairs of at most ``test_batchsize`` triples;
    in mini-batch mode triple node ids are remapped to batch-local indices
    and ranking candidates are the batch's nodes only;
  * scoring inside ranking is chunked by ``mrr_batchsize``
    (reference: lp.py:618-625); per-pair MRR/hits are averaged over pairs
    (reference: lp.py:416-420);
  * negative sampling corrupts 20% of each pair's triples, half heads / half
    tails, replacements drawn from the pair's own nodes
    (reference: lp.py:246-264);
  * in test mode train+valid splits merge (reference: lp.py:102-108);
  * early stopping on ``1 - valid raw MRR`` at eval-interval cadence
    (reference: lp.py:362-364).

TPU-scale extensions beyond the reference: ``[task] neighbor_fanout``
caps each hop's per-node expansion in node-sliced TRAINING batches
(importance-rescaled norms, unbiased aggregation estimator — same
machinery as NC, :mod:`mrgcn_tpu.data.batching`), with
``neighbor_fanout_rounds`` pre-building independent resamples cycled
across epochs; valid/test batches and the final ranking always expand
fully so eval metrics stay exact. ``negative_sampling_ratio`` /
``negative_adversarial_temperature`` reschedule the corruption
(see :func:`make_corruptor`).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
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
    """Feature construction over the merged graph — see tasks/build.py
    (reference: link_prediction.py:424-438)."""
    from mrgcn_tpu.tasks.build import build_dataset_lp
    return build_dataset_lp(kg, nodes_map, config, featureless)


def build_model(inputs: RunInputs, config: Dict, mesh=None,
                text_attn=None) -> MRGCN:
    hidden_dims = hidden_dims_from_config(config, None)
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
                 link_prediction=True,
                 text_vocab_size=inputs.text_vocab_size,
                 text_pad_id=inputs.text_pad_id,
                 under_mesh=mesh is not None, mesh=mesh)


@dataclass
class LPBatch:
    """One (graph slice, triple subset) pair."""

    features: Dict
    edges: object            # EdgeBlock or tuple of per-layer EdgeBlocks
    data: np.ndarray         # (M, 3) triple ids, bucket-padded (batch-local
    #                          in minibatch mode); rows >= num_triples are
    #                          zero padding with weight 0
    corrupt_pool: np.ndarray  # node ids to draw corruptions from (padded)
    num_valid: int           # ranking candidate count (graph or batch local)
    num_triples: int = 0     # real triple count (== len(data) if unpadded)
    num_pool: int = 0        # real corrupt_pool length (rest is padding)
    # cached distmult.RankPlan — the batch's facts are static, so the
    # host filter walk + chunk upload happen once, not per eval epoch.
    # Keyed on a content fingerprint of the facts/num_valid/chunking
    # (see _plan_fingerprint): mutating a batch's facts rebuilds the plan
    rank_plan: object = None

    @property
    def real_data(self) -> np.ndarray:
        return self.data[:self.num_triples]


def make_lp_batches(inputs: RunInputs, data: np.ndarray,
                    gcn_batchsize: int, test_batchsize: int,
                    num_layers: int, fanout=None,
                    rng: Optional[np.random.Generator] = None
                    ) -> List[LPBatch]:
    """Reference batching (reference: lp.py:477-548).

    ``fanout`` (``[task] neighbor_fanout``, normalized or raw — see
    :func:`mrgcn_tpu.data.batching.normalize_fanout`) caps each hop's
    per-node expansion with importance-rescaled norms in the node-sliced
    branch, bounding batch shapes / HBM like the NC path. Pass it for
    TRAINING batches only: ranking must ride exact full-expansion
    embeddings."""
    sample_nodes = np.union1d(data[:, 0], data[:, 2])
    num_nodes = len(sample_nodes)
    if gcn_batchsize <= 0:
        gcn_batchsize = num_nodes
    if test_batchsize <= 0:
        test_batchsize = data.shape[0]

    slices = [slice(b, min(b + gcn_batchsize, num_nodes))
              for b in range(0, num_nodes, gcn_batchsize)]

    batches: List[LPBatch] = []
    if len(slices) > 1:
        from mrgcn_tpu.data import batching
        index = batching.EdgeIndex(inputs.structure)
        for slc in slices:
            batch_node_idx = sample_nodes[slc]
            mask = (np.isin(data[:, 0], batch_node_idx)
                    | np.isin(data[:, 2], batch_node_idx))
            batch_data = data[mask]
            num_samples = batch_data.shape[0]
            if num_samples == 0:
                continue
            for subset in np.array_split(
                    np.arange(num_samples),
                    max(num_samples // test_batchsize, 1)):
                data_subset = np.copy(batch_data[subset])
                subset_nodes = np.union1d(data_subset[:, 0],
                                          data_subset[:, 2]).astype(np.int32)
                # remap triple node ids to batch-local indices
                # (reference: lp.py:528-532)
                local = {v: i for i, v in enumerate(subset_nodes)}
                data_subset[:, 0] = [local[int(i)]
                                     for i in data_subset[:, 0]]
                data_subset[:, 2] = [local[int(i)]
                                     for i in data_subset[:, 2]]

                mb = batching.sample_minibatch(index, subset_nodes,
                                               num_layers, fanout=fanout,
                                               rng=rng)
                feats = batching.subset_features(
                    inputs.features, mb.outer_nodes,
                    num_rows=mb.layer_edges[0].num_in)
                data_pad, pool_pad = _pad_lp_arrays(
                    data_subset.astype(np.int32),
                    np.arange(len(subset_nodes), dtype=np.int32))
                batches.append(LPBatch(
                    features=feats, edges=mb.layer_edges,
                    data=data_pad, corrupt_pool=pool_pad,
                    num_valid=len(subset_nodes),
                    num_triples=len(data_subset),
                    num_pool=len(subset_nodes)))
        from mrgcn_tpu.data.batching import device_put_batches
        put = device_put_batches([(b.features, b.edges) for b in batches])
        batches = [LPBatch(features=f, edges=e, data=b.data,
                           corrupt_pool=b.corrupt_pool,
                           num_valid=b.num_valid,
                           num_triples=b.num_triples,
                           num_pool=b.num_pool)
                   for b, (f, e) in zip(batches, put)]
    else:
        if fanout is not None:
            logger.warning("neighbor_fanout is ignored in full-graph LP "
                           "mode (set [task] gcn_batchsize below the "
                           "split's node count to enable sampling)")
        num_samples = data.shape[0]
        for subset in np.array_split(np.arange(num_samples),
                                     max(num_samples // test_batchsize, 1)):
            data_subset = np.copy(data[subset]).astype(np.int32)
            subset_nodes = np.union1d(data_subset[:, 0],
                                      data_subset[:, 2]).astype(np.int32)
            data_pad, pool_pad = _pad_lp_arrays(data_subset, subset_nodes)
            # ranking candidates are the whole graph here, but corruption
            # draws only from the subset's own nodes (reference:
            # lp.py:256-259)
            batches.append(LPBatch(
                features=inputs.features, edges=inputs.edges,
                data=data_pad, corrupt_pool=pool_pad,
                num_valid=inputs.num_nodes,
                num_triples=len(data_subset),
                num_pool=len(subset_nodes)))
    return batches


def _pad_lp_arrays(data: np.ndarray, pool: np.ndarray):
    """Bucket-pad triples and the corruption pool so batch shapes repeat
    (power-of-two buckets -> few compiled programs, scan-groupable).
    Padding triples are (0,0,0) rows masked by weight 0 in the loss;
    padding pool entries are never drawn (draws index < num_pool)."""
    from mrgcn_tpu.data.batching import bucket
    M = bucket(len(data), 64)
    P = bucket(len(pool), 64)
    data_pad = np.zeros((M, 3), dtype=np.int32)
    data_pad[:len(data)] = data
    pool_pad = np.zeros(P, dtype=np.int32)
    pool_pad[:len(pool)] = pool
    return data_pad, pool_pad


def sample_negatives(rng: np.random.Generator,
                     batch: LPBatch) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side within-batch corruption (reference: lp.py:246-268).
    Returns (triples, labels): positives followed by corrupted copies.
    Kept as the oracle for the in-jit corruption in ``make_steps`` (same
    semantics, jax PRNG) and for tests."""
    data = batch.real_data
    num_samples = data.shape[0]
    ncorrupt = num_samples // 5
    if ncorrupt == 0:
        return data, np.ones(num_samples, dtype=np.float32)

    nc_head = ncorrupt // 2
    nc_tail = ncorrupt - nc_head
    pool = batch.corrupt_pool[:batch.num_pool] if batch.num_pool \
        else batch.corrupt_pool
    pick = rng.choice(num_samples, ncorrupt, replace=False)
    corrupted = np.copy(data[pick])
    corrupted[:nc_head, 0] = rng.choice(pool, nc_head)
    corrupted[nc_head:, 2] = rng.choice(pool, nc_tail)

    triples = np.concatenate([data, corrupted], axis=0)
    labels = np.concatenate([np.ones(num_samples, dtype=np.float32),
                             np.zeros(ncorrupt, dtype=np.float32)])
    return triples, labels


def make_corruptor(neg_ratio: float = 0.2):
    """Build the in-jit corruption function for a negative-sampling ratio.

    Negative-sample scheduling (TPU-scale extension; the reference
    hardcodes 1/5 uniform, lp.py:246-268): the corrupted fraction is a
    config knob (``[task] negative_sampling_ratio``). The ratio is
    quantized to 1/1000 so corrupted counts are exact integer math on
    traced int32 (``floor(n * 200 / 1000) == n // 5`` at the default —
    float floors drift at FB15k-scale counts); products stay < 2^31 for
    any plausible batch * ratio.
    """
    if neg_ratio < 0:
        raise ValueError("negative_sampling_ratio must be >= 0")
    neg_num = int(round(neg_ratio * 1000))

    def _corrupt(data, num_triples, pool, num_pool, rng):
        """In-jit within-batch corruption over bucket-padded arrays —
        semantics of :func:`sample_negatives` (reference: lp.py:246-268)
        at the default ratio 0.2: ``floor(ratio * num_triples)`` of the
        REAL triples (distinct rows while ratio <= 1, uniform with
        replacement above), half heads / half tails, replacements drawn
        uniformly from the REAL pool entries. Padding rows carry weight
        0. Corruption-slot counts are static (derived from the padded
        M), so bucket shapes keep repeating across batches."""
        M = data.shape[0]
        # padded corruption slots (static); (M * 200) // 1000 == M // 5 at
        # the default ratio, matching the reference exactly
        ncp = (M * neg_num) // 1000
        nc_head = ncp // 2
        # n * neg_num // 1000 == n*q + (n*r)//1000 exactly — keeps every
        # traced product <= M * max(q, r) so the int32 math can't overflow
        # at large batch x ratio (guarded below; a configuration past the
        # guard could not allocate its ncp-row array anyway)
        q, r = divmod(neg_num, 1000)
        if M * max(q, r, 1) >= 2**31:
            raise ValueError(
                f"padded batch {M} x negative_sampling_ratio "
                f"{neg_num / 1000} exceeds int32 corruption math; lower "
                f"gcn_batchsize or the ratio")
        k1, k2, k3 = jax.random.split(rng, 3)
        if ncp <= M:
            # distinct real rows first: random key, padding pushed back
            key = jax.random.uniform(k1, (M,)) \
                + (jnp.arange(M) >= num_triples) * 10.0
            pick = jnp.argsort(key)[:ncp]
        else:
            # ratio > 1: more negatives than rows — sample real rows
            # uniformly with replacement
            pick = jax.random.randint(k1, (ncp,), 0,
                                      jnp.maximum(num_triples, 1))

        n_real = jnp.minimum(num_triples * q + (num_triples * r) // 1000,
                             ncp)
        n_real_head = n_real // 2
        n_real_tail = n_real - n_real_head
        # Route the REAL picks into the weighted slots of BOTH segments.
        # ``pick`` packs real source rows first (the sort pushes padding
        # back; the replacement branch draws real rows only), but the
        # head/tail segments are STATIC halves: without routing, the
        # weighted tail slots [nc_head, nc_head + n_real_tail) read picks
        # [nc_head, ...) which are PADDING rows whenever
        # num_triples < nc_head + n_real_tail — the model then trains on
        # (0, 0, tail) garbage negatives at full weight. Weighted head
        # slots take picks [0, n_real_head), weighted tail slots picks
        # [n_real_head, n_real); the zero-weight remainder slots take the
        # leftover picks (possibly padding — harmless at weight 0).
        t = jnp.arange(ncp)
        src = jnp.where(
            t < n_real_head, t,
            jnp.where(
                t < nc_head, n_real + (t - n_real_head),
                jnp.where(t < nc_head + n_real_tail,
                          n_real_head + (t - nc_head),
                          n_real + (nc_head - n_real_head)
                          + (t - nc_head - n_real_tail))))
        corrupted = data[pick[src]]
        heads = pool[jax.random.randint(k2, (nc_head,), 0, num_pool)]
        tails = pool[jax.random.randint(k3, (ncp - nc_head,), 0,
                                        num_pool)]
        corrupted = corrupted.at[:nc_head, 0].set(heads)
        corrupted = corrupted.at[nc_head:, 2].set(tails)
        triples = jnp.concatenate([data, corrupted], axis=0)

        w_pos = (jnp.arange(M) < num_triples)
        w_head = jnp.arange(nc_head) < n_real_head
        w_tail = jnp.arange(ncp - nc_head) < n_real_tail
        labels = jnp.concatenate([jnp.ones(M, jnp.float32),
                                  jnp.zeros(ncp, jnp.float32)])
        weights = jnp.concatenate([w_pos, w_head, w_tail]) \
            .astype(jnp.float32)
        return triples, labels, weights

    return _corrupt


def make_steps(model: MRGCN, optimizer, config: Dict):
    l1 = config["model"]["l1_lambda"]
    l2 = config["model"]["l2_lambda"]
    # negative-sample scheduling knobs; defaults (ratio 0.2, temperature 0)
    # are bit-identical to the reference's hardcoded semantics
    _corrupt = make_corruptor(
        float(config["task"].get("negative_sampling_ratio", 0.2)))
    adv_alpha = float(config["task"].get(
        "negative_adversarial_temperature", 0.0))

    def _update(params, batch_stats, opt_state, features, edges, data,
                pool, num_triples, num_pool, rng):
        rng, crng = jax.random.split(rng)
        triples, labels, weights = _corrupt(data, num_triples, pool,
                                            num_pool, crng)

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                features, edges, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            relations = p["rgcn"]["relations"]
            y_hat = distmult.score(triples[:, 0], triples[:, 1],
                                   triples[:, 2], out, relations)
            bce = optax.sigmoid_binary_cross_entropy(y_hat, labels)
            if adv_alpha > 0.0:
                # self-adversarial negative weighting (RotatE, Sun et al.
                # 2019 — no reference analogue): negatives reweighted by
                # softmax(alpha * score) under stop-gradient, mass
                # renormalised to the real negative count so the
                # positive:negative balance (and sum(weights), hence the
                # loss scale) matches the uniform default exactly.
                neg = labels == 0.0
                logits = jnp.where(neg & (weights > 0),
                                   adv_alpha * jax.lax.stop_gradient(y_hat),
                                   -jnp.inf)
                n_neg = jnp.sum(weights * neg)
                p_adv = jnp.where(n_neg > 0, jax.nn.softmax(logits), 0.0)
                w_eff = jnp.where(neg, p_adv * n_neg, weights)
            else:
                w_eff = weights
            loss = jnp.sum(bce * w_eff) / jnp.maximum(
                jnp.sum(weights), 1.0)
            loss = loss + tutils.regularization(p, l1, l2)
            return loss, updates.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    # donate the mutable training state so XLA updates buffers in place
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, features, edges, data,
                   pool, num_triples, num_pool, rng):
        return _update(params, batch_stats, opt_state, features, edges,
                       data, pool, num_triples, num_pool, rng)

    # scan-batched epochs: one dispatch per shape group (see the NC
    # driver's group_batches for rationale)
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_group(params, batch_stats, opt_state, stacked, rngs):
        def body(carry, xs):
            params, batch_stats, opt_state = carry
            (features, edges, data, pool, nt, npool), rng = xs
            params, batch_stats, opt_state, loss = _update(
                params, batch_stats, opt_state, features, edges, data,
                pool, nt, npool, rng)
            return (params, batch_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), (stacked, rngs))
        return params, batch_stats, opt_state, losses

    @jax.jit
    def embed(params, batch_stats, features, edges):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           features, edges, train=False)

    return train_step, train_group, embed


def group_lp_batches(batches: List[LPBatch]):
    """Group LP batches by pytree structure + leaf shapes/dtypes and stack
    on a scan axis (mirror of node_classification.group_batches)."""
    groups: Dict = {}
    order: List = []
    for i, b in enumerate(batches):
        payload = (b.features, b.edges, jnp.asarray(b.data),
                   jnp.asarray(b.corrupt_pool),
                   jnp.int32(b.num_triples), jnp.int32(b.num_pool))
        leaves, treedef = jax.tree.flatten(payload)
        key = (treedef, tuple((leaf.shape, str(leaf.dtype))
                              for leaf in leaves))
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(payload)
    return [jax.tree.map(lambda *xs: jnp.stack(xs), *groups[key])
            for key in order]


def _plan_fingerprint(datas: List[np.ndarray], num_valid: int,
                      mrr_batchsize: int) -> tuple:
    """Content hash of the inputs a cached RankPlan was built from. CRC32
    over the fact arrays is ~μs per MB — negligible next to the ranking
    programs it guards."""
    import zlib
    return (int(num_valid), int(mrr_batchsize),
            tuple((d.shape, zlib.crc32(np.ascontiguousarray(d).tobytes()))
                  for d in datas))


def evaluate(batches: List[LPBatch], embed_fn, params, batch_stats,
             mrr_batchsize: int, filter_ranks: bool):
    """Per-pair ranking, averaged over pairs
    (reference: link_prediction.py:375-422)."""
    relations = params["rgcn"]["relations"]
    mrr = {"raw": [], "flt": []}
    hits = {"raw": [[] for _ in K], "flt": [[] for _ in K]}
    rankings = {"raw": [], "flt": []}

    # triple subsets that share a graph slice (always true in full-batch
    # mode, where every subset carries the same ``inputs.edges`` object)
    # reuse one embedding pass — the reference recomputes per subset
    # (reference: link_prediction.py:219-221, 375-422). All subsets'
    # ranking chunks are DISPATCHED first (async), then materialised with
    # one batched device->host fetch — per-subset blocking round trips
    # dominate the eval epoch otherwise (benchmarks/lp_eval_bench.py).
    # triple subsets sharing a graph slice get ONE embedding pass and ONE
    # stacked RankPlan (chunks never span subsets, so each subset keeps
    # the reference's filter-against-its-own-facts and per-batch-mean
    # semantics) — the whole group's ranking dispatches as two scanned
    # programs instead of 2 x num_subsets. Plans and facts are static
    # across evals: the plan caches on the group's first batch
    # (per-chunk host->device puts + the Python filter walk re-done per
    # eval were the 5.9 s wall of the FB15k-scale eval epoch).
    group_idx: dict = {}
    groups: list = []            # [(key, [batch index, ...])]
    for bi, b in enumerate(batches):
        key = (id(b.edges), b.num_valid)
        if key not in group_idx:
            group_idx[key] = len(groups)
            groups.append((key, []))
        groups[group_idx[key]][1].append(bi)

    pendings = []
    group_bounds = []
    for _, members in groups:
        b0 = batches[members[0]]
        emb = embed_fn(params, batch_stats, b0.features, b0.edges)
        datas = [batches[bi].real_data
                 if batches[bi].num_triples else batches[bi].data
                 for bi in members]
        # cache keyed on a content fingerprint of everything the plan
        # depends on — any change to a member's facts, the candidate
        # count, or the chunking rebuilds it (CLAUDE.md invariant,
        # mechanical rather than by convention)
        fp = _plan_fingerprint(datas, b0.num_valid, mrr_batchsize)
        cached = b0.rank_plan
        if not (isinstance(cached, tuple) and len(cached) == 3
                and cached[2] == fp):
            plan, bounds = distmult.prepare_rank_chunks_many(
                datas, int(emb.shape[0]), chunk_size=mrr_batchsize,
                num_valid=b0.num_valid)
            b0.rank_plan = cached = (plan, bounds, fp)
        plan, bounds, _ = cached
        group_bounds.append(bounds)
        pendings.append(distmult.launch_ranks_plan(plan, emb, relations))

    per_batch: list = [None] * len(batches)
    for (_, members), bounds, (raw_g, flt_g) in zip(
            groups, group_bounds, distmult.collect_many(pendings)):
        T = sum(n for _, n in bounds)
        for bi, (s, n) in zip(members, bounds):
            per_batch[bi] = (
                np.concatenate([raw_g[s:s + n], raw_g[T + s:T + s + n]]),
                np.concatenate([flt_g[s:s + n], flt_g[T + s:T + s + n]]))

    for raw, flt in per_batch:
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

    from mrgcn_tpu.parallel import mesh as pmesh
    mesh = pmesh.mesh_from_config(config)
    if mesh is not None:
        logger.info("Training under device mesh %s", dict(mesh.shape))
        inputs = pmesh.shard_inputs(mesh, inputs)

    data = {k: np.asarray(v) for k, v in artifact.data.items()}
    if test_split == "test":
        # merge train and valid for training (reference: lp.py:102-108)
        data["train"] = np.concatenate([data["train"], data["valid"]],
                                       axis=0)
        data["valid"] = None

    # load any checkpoint BEFORE the model builds: the text-attention impl
    # (and with it the param-tree shape) is resolved at trace time, so a
    # checkpoint saved under a different default must pin it up front
    state = None
    text_attn = None
    if checkpoint is not None:
        state = tutils.load_checkpoint(checkpoint)
        if state.get("format") != "torch":
            text_attn = tutils.reconcile_text_attn(state["params"])

    model = build_model(inputs, config, mesh=mesh, text_attn=text_attn)

    jrng = jax.random.PRNGKey(seed)
    jrng, init_rng = jax.random.split(jrng)
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

    nepoch = config["model"]["epoch"]
    eval_interval = config["task"]["eval_interval"]
    filter_ranks = config["task"]["filter_ranks"]
    gcn_batchsize = int(config["task"].get("gcn_batchsize", -1))
    test_batchsize = int(config["task"].get("test_batchsize", -1))
    mrr_batchsize = int(config["task"].get("mrr_batchsize", -1))
    num_layers = len(model.hidden_dims)
    patience = config["task"]["early_stopping"]["patience"]
    tolerance = config["task"]["early_stopping"]["tolerance"]
    early_stop = tutils.EarlyStop(patience, tolerance) \
        if patience > 0 else None

    # neighbour-sampled TRAINING batches (TPU-scale extension mirroring
    # NC: [task] neighbor_fanout caps each hop's per-node expansion with
    # importance-rescaled norms; neighbor_fanout_rounds pre-builds R
    # independent resamples cycled across epochs). Only the train split
    # samples — valid/test batches and the final ranking always expand
    # fully, so reported eval metrics stay exact. Train MRR is computed
    # on the sampled train batches (a training estimator, like NC's
    # train accuracy under sampling).
    from mrgcn_tpu.data import batching as _batching
    fanout_cfg = config["task"].get("neighbor_fanout")
    fanout = None
    if fanout_cfg not in (None, -1):
        num_train_nodes = len(np.union1d(data["train"][:, 0],
                                         data["train"][:, 2]))
        if 0 < gcn_batchsize < num_train_nodes:
            fanout = _batching.normalize_fanout(fanout_cfg, num_layers)
        else:
            logger.warning("neighbor_fanout is ignored in full-graph LP "
                           "mode (set [task] gcn_batchsize below the "
                           "split's node count to enable sampling)")
    rounds = max(1, int(config["task"].get("neighbor_fanout_rounds", 1))) \
        if fanout is not None else 1
    sample_rng = np.random.default_rng(seed)

    train_rounds = [make_lp_batches(inputs, data["train"], gcn_batchsize,
                                    test_batchsize, num_layers,
                                    fanout=fanout, rng=sample_rng)
                    for _ in range(rounds)]
    train_batches = train_rounds[0]
    valid_batches = make_lp_batches(inputs, data["valid"], gcn_batchsize,
                                    test_batchsize, num_layers) \
        if data["valid"] is not None else []

    model = tutils.with_gate_skip(model, params)
    train_step, train_group, embed_fn = make_steps(model, optimizer,
                                                    config)

    # scan-batched epochs: one device dispatch per shape group; corruption
    # runs in-jit (MRGCN_SCAN_BATCHES=0 restores per-batch dispatch)
    import os as _os
    use_scan = (_os.environ.get("MRGCN_SCAN_BATCHES", "1") != "0"
                and len(train_batches) > 1)
    train_group_rounds = [group_lp_batches(b) if use_scan else None
                          for b in train_rounds]
    train_groups = train_group_rounds[0]
    # per-batch path: ship the static triple/pool arrays to the device
    # ONCE — jnp.asarray inside the epoch loop re-uploaded them every
    # step (megabyte-scale blocking puts per epoch on remote devices)
    train_dev_rounds = [None if use_scan else
                        [(b, jnp.asarray(b.data), jnp.asarray(b.corrupt_pool))
                         for b in bs]
                        for bs in train_rounds]
    train_dev = train_dev_rounds[0]

    logger.info("Training for %d epoch (%d batch(es)%s)", nepoch,
                len(train_batches),
                f", {len(train_groups)} scan group(s)"
                if train_groups else "")
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
        if rounds > 1:
            ri = (ep - 1) % rounds
            train_batches = train_rounds[ri]
            train_groups = train_group_rounds[ri]
            train_dev = train_dev_rounds[ri]

        losses = []
        if train_groups is not None:
            # in-place terminal progress
            # (reference: link_prediction.py:231-235)
            progress = tutils.BatchProgress(len(train_groups),
                                            label="TRAIN")
            for gi, stacked in enumerate(train_groups, 1):
                progress.update(gi)
                count = jax.tree.leaves(stacked)[0].shape[0]
                jrng, key = jax.random.split(jrng)
                rngs = jax.random.split(key, count)
                params, batch_stats, opt_state, ls = train_group(
                    params, batch_stats, opt_state, stacked, rngs)
                losses.extend(np.asarray(ls).tolist())
            progress.done()
        else:
            progress = tutils.BatchProgress(len(train_dev),
                                            label="TRAIN")
            for bi, (b, data_dev, pool_dev) in enumerate(train_dev, 1):
                progress.update(bi)
                jrng, step_rng = jax.random.split(jrng)
                params, batch_stats, opt_state, batch_loss = train_step(
                    params, batch_stats, opt_state, b.features, b.edges,
                    data_dev, pool_dev,
                    jnp.int32(b.num_triples), jnp.int32(b.num_pool),
                    step_rng)
                losses.append(float(batch_loss))
            progress.done()
        loss = float(np.mean(losses))
        results_str = f"{ep:04d} | loss {loss:.4f}"

        train_mrr = train_hits = valid_mrr = valid_hits = None
        if ep % eval_interval == 0 or ep == nepoch + epoch:
            train_mrr, train_hits, _ = evaluate(
                train_batches, embed_fn, params, batch_stats,
                mrr_batchsize, filter_ranks)
            results_str += f" | train MRR {train_mrr['raw']:.4f} (raw)"
            if filter_ranks:
                results_str += f" / {train_mrr['flt']:.4f} (filtered)"

            if valid_batches and ep < nepoch + epoch:
                valid_mrr, valid_hits, _ = evaluate(
                    valid_batches, embed_fn, params, batch_stats,
                    mrr_batchsize, filter_ranks)
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
    test_batches = make_lp_batches(inputs, data[test_split], gcn_batchsize,
                                   test_batchsize, num_layers)
    test_mrr, test_hits, test_ranks = evaluate(
        test_batches, embed_fn, params, batch_stats, mrr_batchsize,
        filter_ranks)
    logger.info("Testing time: %.2fs", time() - t0)

    row = [-1] * 18
    row.extend([str(test_mrr["raw"]), str(test_hits["raw"][0]),
                str(test_hits["raw"][1]), str(test_hits["raw"][2]),
                str(test_mrr["flt"]), str(test_hits["flt"][0]),
                str(test_hits["flt"][1]), str(test_hits["flt"][2])])
    tsv_writer.writerow(row)

    state = (params, opt_state, batch_stats)
    return state, final_epoch, loss, test_mrr, test_hits, test_ranks
