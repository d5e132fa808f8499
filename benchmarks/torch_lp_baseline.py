"""torch-CPU counterpart of bench_suite's LP epoch (FB15k-237 scale).

Reference-style DistMult R-GCN training step in PyTorch on CPU — the
comparison baseline for ``lp_fb15k237_epoch_time``. Mirrors the reference's
computation (sparse hstacked A x [I]W_I with basis decomposition,
within-batch corruption, BCE; reference: mrgcn/layers/graph.py:62-102,
mrgcn/tasks/link_prediction.py:191-330) on the same synthetic workload as
benchmarks/bench_suite.lp_workload.

Run: python benchmarks/torch_lp_baseline.py [--steps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2)
    args = parser.parse_args()

    import torch

    from benchmarks.bench_suite import lp_workload

    w = lp_workload()
    n, R = w["n"], w["R"]
    hidden, B = 200, 2
    E = len(w["src"])
    trip = torch.from_numpy(w["trip"]).long()

    # hstacked sparse adjacency (n, R*n), reference layout
    rows = torch.from_numpy(w["src"]).long()
    cols = (torch.from_numpy(w["rel"]).long() * n
            + torch.from_numpy(w["dst"]).long())
    vals = torch.from_numpy(w["norm"])
    A = torch.sparse_coo_tensor(torch.stack([rows, cols]), vals,
                                (n, R * n)).coalesce()

    torch.manual_seed(0)
    bases_i = torch.nn.Parameter(torch.randn(B, n, hidden) * 0.01)
    comp_i = torch.nn.Parameter(torch.randn(R, B) * 0.1)
    bases_f = torch.nn.Parameter(torch.randn(B, hidden, hidden) * 0.01)
    comp_f = torch.nn.Parameter(torch.randn(R, B) * 0.1)
    relations = torch.nn.Parameter(torch.randn(R, hidden) * 0.1)
    params = [bases_i, comp_i, bases_f, comp_f, relations]
    opt = torch.optim.Adam(params, lr=0.01)

    rng = np.random.default_rng(0)
    ncorrupt = trip.shape[0] // 5
    labels = torch.cat([torch.ones(trip.shape[0]), torch.zeros(ncorrupt)])

    def epoch() -> float:
        t0 = time.time()
        W_I = torch.einsum("rb,bno->rno", comp_i, bases_i).reshape(
            R * n, hidden)
        H = torch.sparse.mm(A, W_I)
        H = torch.relu(H)
        W_F = torch.einsum("rb,bio->rio", comp_f, bases_f).reshape(
            R * n if False else R, hidden, hidden)
        HW = torch.einsum("ni,rio->rno", H, W_F).reshape(R * n, hidden)
        emb = torch.relu(torch.sparse.mm(A, HW))

        pick = rng.choice(trip.shape[0], ncorrupt, replace=False)
        corrupt = trip[pick].clone()
        corrupt[:ncorrupt // 2, 0] = torch.from_numpy(
            rng.integers(0, n, ncorrupt // 2))
        corrupt[ncorrupt // 2:, 2] = torch.from_numpy(
            rng.integers(0, n, ncorrupt - ncorrupt // 2))
        batch = torch.cat([trip, corrupt], 0)
        score = (emb[batch[:, 0]] * relations[batch[:, 1]]
                 * emb[batch[:, 2]]).sum(1)
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            score, labels)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        opt.step()
        return time.time() - t0

    epoch()  # warm-up
    times = [epoch() for _ in range(args.steps)]
    result = {"torch_cpu_lp_epoch_s": float(np.median(times)),
              "workload": "n=14541, E~560k incl inverses+loops, R=475, "
                          "hidden=200, B=2, 272k triples, full-batch"}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
