"""Relation-group size sweep for the grouped MXU aggregation path.

Two tuning constants existed without a sweep: full-batch grouping uses
group_size=128 (encodings/structure.py) while the mini-batch sampler uses
64 (data/batching.py). This measures transform_aggregate_grouped across
group sizes at both scales (padded edge counts grow as group_size does —
every relation pads to a multiple — so bigger is not automatically
better).

Run:  python benchmarks/micro_group_size.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep(name, src, dst, rel, norm, n, in_dim, out_dim, R, B, sizes):
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import per_iter_time
    from mrgcn_tpu.encodings.structure import group_by_relation
    from mrgcn_tpu.ops import rspmm

    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((n, in_dim)).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal((B, in_dim, out_dim))
                        .astype(np.float32))
    comp = jnp.asarray(rng.standard_normal((R, B)).astype(np.float32))

    for gs in sizes:
        g = group_by_relation(src, dst, rel, norm, n, group_size=gs)
        E_pad = len(g.src)
        t = per_iter_time(
            lambda h, b, c, _g=g: rspmm.transform_aggregate_grouped(
                h, jnp.asarray(_g.src), jnp.asarray(_g.dst),
                jnp.asarray(_g.norm), jnp.asarray(_g.group_rel),
                _g.group_size, n, b, comp=c),
            H, basis, comp, iters=10)
        print(json.dumps({"workload": name, "group_size": gs,
                          "E_padded": int(E_pad),
                          "ms": round(t * 1e3, 3)}), flush=True)


def main():
    # LP scale: FB15k-237 (hidden 200, R=475) — the big grouped consumer
    from benchmarks.bench_suite import lp_workload
    w = lp_workload()
    sweep("lp_fb15k", w["src"], w["dst"], w["rel"], w["norm"], w["n"],
          200, 200, w["R"], 2, (32, 64, 128, 256, 512))

    # mini-batch hop scale: ~2k edges over ~1k nodes, many relations
    rng = np.random.default_rng(1)
    n, E, R = 1024, 2048, 61
    src = rng.integers(0, n, E).astype(np.int32)
    dst = rng.integers(0, n, E).astype(np.int32)
    rel = rng.integers(0, R, E).astype(np.int32)
    norm = rng.random(E).astype(np.float32)
    sweep("minibatch_hop", src, dst, rel, norm, n, 36, 16, R, 40,
          (16, 32, 64, 128))


if __name__ == "__main__":
    sys.exit(main() or 0)
