"""Link-prediction full-entity ranking throughput: TPU vs torch-CPU.

FB15k-237-scale workload: 15k entities, 237 relations, h=200 embeddings,
500 facts ranked against every entity (head + tail), filtered + raw, chunked
by mrr_batchsize=50 — the reference's hottest evaluation kernel
(reference: link_prediction.py:593-643).

The torch baseline re-expresses the reference's candidate-expansion approach
(broadcast DistMult over an (F, N, 3) expansion, chunked); the TPU path is
mrgcn_tpu.ops.distmult (one (F, h) x (h, N) matmul per chunk, raw+filtered
from one scoring pass).

Prints one JSON line with facts/second for both and the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_workload(n=15_000, R=237, h=200, F=500, seed=0):
    rng = np.random.default_rng(seed)
    E_nodes = rng.standard_normal((n, h)).astype(np.float32)
    E_edges = rng.standard_normal((R, h)).astype(np.float32)
    data = np.stack([rng.integers(0, n, F), rng.integers(0, R, F),
                     rng.integers(0, n, F)], axis=1).astype(np.int64)
    return E_nodes, E_edges, data


def torch_rank(E_nodes, E_edges, data, chunk=50):
    """Reference-style ranking in torch (own expression of the same math:
    expand candidates, chunked broadcast scoring, optimistic rank + half-tie,
    filtered -inf), run twice (raw + filtered) like the reference."""
    import torch

    E_nodes = torch.as_tensor(E_nodes)
    E_edges = torch.as_tensor(E_edges)
    data_t = torch.as_tensor(data)
    F = data_t.shape[0]
    n = E_nodes.shape[0]

    heads, tails = {}, {}
    for s, p, o in data:
        heads.setdefault((p, o), []).append(s)
        tails.setdefault((s, p), []).append(o)

    out = []
    for filtered in (False, True):
        for head in (False, True):
            bases = data_t[:, 1:] if head else data_t[:, :2]
            targets = data_t[:, 0] if head else data_t[:, 2]
            scores = torch.zeros((F, n))
            ar = torch.arange(n)
            for begin in range(0, F, chunk):
                end = min(begin + chunk, F)
                b = bases[begin:end]
                if head:
                    part = E_edges[b[:, 0]] * E_nodes[b[:, 1]]
                else:
                    part = E_nodes[b[:, 0]] * E_edges[b[:, 1]]
                scores[begin:end] = part @ E_nodes.T
            if filtered:
                for i, (s, p, o) in enumerate(data):
                    known = heads.get((p, o), []) if head \
                        else tails.get((s, p), [])
                    target = s if head else o
                    for c in known:
                        if c != target:
                            scores[i, c] = float("-inf")
            true = scores[torch.arange(F), targets]
            ranks = (scores > true[:, None]).sum(1)
            ties = (scores == true[:, None]).sum(1)
            out.append(ranks + torch.round((ties - 1) / 2).long() + 1)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.ops import distmult

    E_nodes, E_edges, data = make_workload()
    F = data.shape[0]

    # torch CPU baseline (raw + filtered, head + tail)
    t0 = time.time()
    torch_rank(E_nodes, E_edges, data)
    torch_s = time.time() - t0

    # TPU (raw + filtered from one scoring pass)
    nodes_dev = jnp.asarray(E_nodes)
    edges_dev = jnp.asarray(E_edges)
    distmult.compute_ranks(data, nodes_dev, edges_dev, chunk_size=50)  # warm
    t0 = time.time()
    steps = 5
    for _ in range(steps):
        distmult.compute_ranks(data, nodes_dev, edges_dev, chunk_size=50)
    tpu_s = (time.time() - t0) / steps

    print(json.dumps({
        "workload": "fb15k237_scale_rank_500_facts_raw+filtered",
        "torch_cpu_s": round(torch_s, 4),
        "tpu_s": round(tpu_s, 4),
        "speedup": round(torch_s / tpu_s, 2),
        "tpu_facts_per_s": round(F / tpu_s, 1),
    }))


if __name__ == "__main__":
    main()
