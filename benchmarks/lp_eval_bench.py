"""LP evaluation epoch at FB15k-237 scale: embed + rank over all subsets.

The reference's ``test_model`` recomputes node embeddings for every triple
subset (reference: link_prediction.py:219-221, 375-422); in full-batch
mode every subset shares the same graph, so mrgcn_tpu's ``evaluate`` now
caches the embedding pass per graph slice. This benchmark times the full
eval epoch (20k test facts, test_batchsize 500 -> 40 subsets, filtered
ranking over all 14.5k entities in mrr_batchsize=50 chunks) with the
cache on and artificially defeated (each subset given its own edges
object), so the saving is a recorded number.

Run:  python benchmarks/lp_eval_bench.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_suite import lp_workload  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.models.rgcn import RGCN, EdgeBlock
    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.tasks.link_prediction import LPBatch, evaluate

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    plans = rl.plans_for_layers(
        w["src"], w["dst"], w["rel"], w["norm"], n,
        [(None, hidden), (hidden, hidden)],
        identity_basis=rl.basis_stream_wanted(R, n, hidden, B))
    grouping = group_by_relation(w["src"], w["dst"], w["rel"], w["norm"], n)
    edges = EdgeBlock(src=jnp.asarray(w["src"]), dst=jnp.asarray(w["dst"]),
                      rel=jnp.asarray(w["rel"]),
                      norm=jnp.asarray(w["norm"]), num_out=n, plans=plans,
                      grp_src=jnp.asarray(grouping.src),
                      grp_dst=jnp.asarray(grouping.dst),
                      grp_norm=jnp.asarray(grouping.norm),
                      group_rel=jnp.asarray(grouping.group_rel),
                      group_size=grouping.group_size)
    model = RGCN(hidden_dims=(hidden, hidden), num_relations=R,
                 num_nodes=n, num_bases=B, featureless=True,
                 link_prediction=True)
    variables = model.init(jax.random.PRNGKey(0), None, edges)
    params = {"rgcn": variables["params"]}

    @jax.jit
    def embed(params, batch_stats, features, edges):
        return model.apply({"params": params["rgcn"]}, None, edges)

    # FB15k-237's test split: 20,466 facts; test_batchsize 500 (config)
    rng = w["rng"]
    test = np.stack([rng.integers(0, n, 20_466),
                     rng.integers(0, (R - 1) // 2, 20_466),
                     rng.integers(0, n, 20_466)], axis=1).astype(np.int32)
    subsets = np.array_split(np.arange(test.shape[0]),
                             max(test.shape[0] // 500, 1))
    batches = [LPBatch(features={}, edges=edges, data=test[s],
                       corrupt_pool=np.arange(n, dtype=np.int32),
                       num_valid=n) for s in subsets]

    def timed_eval(bs):
        t0 = time.perf_counter()
        out = evaluate(bs, embed, params, {}, mrr_batchsize=50,
                       filter_ranks=True)
        dt = time.perf_counter() - t0
        return dt, out

    # warm-up: one FULL pass so every chunk-shape's ranking program is
    # compiled before either timed measurement
    timed_eval(batches)

    t_cached, res_cached = timed_eval(batches)

    # defeat the per-slice cache: distinct edges objects per subset
    uncached = [dataclasses.replace(b, edges=EdgeBlock(
        src=edges.src, dst=edges.dst, rel=edges.rel, norm=edges.norm,
        num_out=edges.num_out, plans=edges.plans,
        grp_src=edges.grp_src, grp_dst=edges.grp_dst,
        grp_norm=edges.grp_norm, group_rel=edges.group_rel,
        group_size=edges.group_size)) for b in batches]
    t_uncached, res_uncached = timed_eval(uncached)

    assert abs(res_cached[0]["raw"] - res_uncached[0]["raw"]) < 1e-6

    print(json.dumps({
        "lp_eval_epoch_cached_s": round(t_cached, 3),
        "lp_eval_epoch_percompute_s": round(t_uncached, 3),
        "num_subsets": len(batches),
        "facts": int(test.shape[0]),
        "speedup": round(t_uncached / t_cached, 2)}), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
