"""Reference-math torch baseline for the headline benchmark.

Re-expresses the reference's full-batch R-GCN training epoch in PyTorch —
sparse ``n x (R*n)`` hstacked adjacency, basis-decomposed weights, identity
(featureless) input layer, CE loss, Adam, grad clip — matching the compute
performed per epoch by reference: mrgcn/layers/graph.py:62-102 and
mrgcn/tasks/node_classification.py:146-201. Written independently (not
copied); used only to measure the CPU baseline epoch time stored in
``bench_baseline.json``.

Usage: python benchmarks/torch_baseline.py [--steps 3]
Prints mean seconds per epoch on stdout (last line, JSON).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_workload(n=100_000, num_props=60, num_edges=600_000, hidden=16,
                   num_classes=14, num_bases=40, num_labeled=10_000,
                   seed=0):
    rng = np.random.default_rng(seed)
    R = num_props * 2 + 1
    src = rng.integers(0, n, num_edges).astype(np.int64)
    dst = rng.integers(0, n, num_edges).astype(np.int64)
    rel = rng.integers(0, R - 1, num_edges).astype(np.int64)
    loop = np.arange(n, dtype=np.int64)
    src = np.concatenate([src, loop])
    dst = np.concatenate([dst, loop])
    rel = np.concatenate([rel, np.full(n, R - 1, dtype=np.int64)])

    # per-relation row normalisation (D^-1 A)
    key = rel * n + src
    deg = np.bincount(key, minlength=R * n)
    norm = (1.0 / deg[key]).astype(np.float32)

    labels_idx = rng.choice(n, num_labeled, replace=False)
    labels_cls = rng.integers(0, num_classes, num_labeled)
    return dict(n=n, R=R, src=src, dst=dst, rel=rel, norm=norm,
                hidden=hidden, num_classes=num_classes,
                num_bases=num_bases, labels_idx=labels_idx,
                labels_cls=labels_cls)


def run_torch_epochs(w, steps=3):
    import torch

    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden, C = w["hidden"], w["num_classes"]

    # hstacked sparse adjacency: rows n, cols R*n
    cols = torch.as_tensor(w["rel"] * n + w["dst"])
    rows = torch.as_tensor(w["src"])
    A = torch.sparse_coo_tensor(
        torch.stack([rows, cols]),
        torch.as_tensor(w["norm"]), size=(n, R * n)).coalesce()

    # layer 1 (featureless input): W_I basis (B, n, hidden) + comp (R, B)
    W_I = torch.empty(B * n, hidden)
    torch.nn.init.xavier_uniform_(W_I)
    W_I = torch.nn.Parameter(W_I)
    comp_I = torch.nn.Parameter(torch.empty(R, B))
    torch.nn.init.xavier_uniform_(comp_I)

    # layer 2: W_F basis (B, hidden, C) + comp
    W_F = torch.nn.Parameter(torch.empty(B, hidden, C))
    torch.nn.init.xavier_uniform_(W_F)
    comp_F = torch.nn.Parameter(torch.empty(R, B))
    torch.nn.init.xavier_uniform_(comp_F)

    params = [W_I, comp_I, W_F, comp_F]
    opt = torch.optim.Adam(params, lr=0.01)
    criterion = torch.nn.CrossEntropyLoss()
    idx = torch.as_tensor(w["labels_idx"])
    target = torch.as_tensor(w["labels_cls"])

    def epoch():
        opt.zero_grad()
        Wi = torch.einsum("rb,bij->rij",
                          comp_I, W_I.view(B, n, hidden)).reshape(R * n,
                                                                  hidden)
        H = torch.relu(torch.mm(A, Wi))
        Wf = torch.einsum("rb,bij->rij", comp_F, W_F)
        FW = torch.einsum("ij,bjk->bik", H, Wf).reshape(R * n, C)
        out = torch.mm(A, FW)
        loss = criterion(out[idx], target)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        opt.step()
        return float(loss)

    epoch()  # warmup
    times = []
    for _ in range(steps):
        t0 = time.time()
        epoch()
        times.append(time.time() - t0)
    return float(np.mean(times))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    w = build_workload()
    secs = run_torch_epochs(w, steps=args.steps)
    print(json.dumps({"torch_cpu_epoch_s": secs}))
