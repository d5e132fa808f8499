"""Dump optimized HLO for the dot->gather program to find the +9 ms op.

Compares against the gather-from-param program. Prints per-op categories
(fusion/copy/gather/dot) with shapes, largest first.

Run:  python benchmarks/micro_compose_hlo.py
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.torch_baseline import build_workload  # noqa: E402


def summarize(name, text):
    print(f"===== {name} =====", flush=True)
    # top-level instructions of the entry computation with big shapes
    lines = [ln for ln in text.splitlines()
             if re.search(r"= f32\[|= s32\[|copy|gather|transpose|custom-call",
                          ln)]
    for ln in lines:
        ln = ln.strip()
        if len(ln) > 220:
            ln = ln[:220] + "…"
        print(ln, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mrgcn_tpu.ops import relational as rl
    from mrgcn_tpu.ops import rspmm

    w = build_workload()
    n, R, B = w["n"], w["R"], w["num_bases"]
    hidden = w["hidden"]
    plans = rl.plans_for_layers(
        np.asarray(w["src"], np.int32), np.asarray(w["dst"], np.int32),
        np.asarray(w["rel"], np.int32), np.asarray(w["norm"], np.float32),
        n, [(None, hidden)])
    plan = plans[f"{rspmm.packing_factor(hidden)}:"
                 f"{rspmm.packing_factor(hidden)}:id"]
    k, f = plan.k_in, plan.fwd

    rng = np.random.default_rng(0)
    shape, _ = rspmm.packed_identity_shape(B, n, hidden)
    packed = jnp.zeros((shape[0], plan.n_in_rows, shape[2]), jnp.float32)
    comp = jnp.zeros((R, B), jnp.float32)
    rows = f.rel * plan.n_in_rows + f.gather_row
    S, _, lw = packed.shape

    def dot_gather(pk, c):
        t = jnp.dot(c, pk.reshape(S, -1),
                    preferred_element_type=jnp.float32).reshape(-1, lw)
        return rl._gather_sub(t, rows, f.in_mod, k, hidden).sum()

    flat0 = jnp.zeros((R * plan.n_in_rows, lw), jnp.float32)

    def pre_gather(t):
        return rl._gather_sub(t, rows, f.in_mod, k, hidden).sum()

    txt1 = jax.jit(dot_gather).lower(packed, comp).compile().as_text()
    txt2 = jax.jit(pre_gather).lower(flat0).compile().as_text()
    summarize("dot_gather", txt1)
    summarize("pre_gather", txt2)


if __name__ == "__main__":
    sys.exit(main() or 0)
