"""Round-3 TPU batch G: validate the frontier restriction + h1 text encoder
on the three production regimes.

  1. bench_headline  -> headline epoch with the FULL frontier chain
                        (restricted layer-1 rectangular plans + restricted
                        output layer) vs output-only restriction is
                        implicit in the r3f number (33.1 ms)
  2. multimodal      -> bench_suite multimodal epoch with the restricted
                        chain and the num_heads=1 text encoder
  3. lp              -> LP epoch sanity (none of this session's changes
                        touch the LP path; the number should hold)

Run:  python benchmarks/tpu_batch_r3g.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded  # noqa: E402


def bench_headline():
    from bench import run_jax_epochs
    from benchmarks.torch_baseline import build_workload

    w = build_workload()
    s = run_jax_epochs(w, steps=10)
    print("FINAL_HEADLINE_CHAIN " + json.dumps(
        {"epoch_chain_s": round(s, 6)}), flush=True)


def multimodal():
    from benchmarks.bench_suite import bench_multimodal

    s = bench_multimodal(steps=5)
    print("FINAL_MM " + json.dumps({"mm_epoch_s": round(s, 6)}), flush=True)


def lp():
    from benchmarks.bench_suite import bench_lp

    epoch, t_rank = bench_lp(steps=5)
    print("FINAL_LP_EPOCH " + json.dumps(
        {"lp_epoch_s": round(epoch, 6),
         "lp_rank_chunk_s": round(t_rank, 6)}), flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== headline: frontier chain =====", flush=True)
    guarded("bench_headline", bench_headline)

    print("\n===== multimodal epoch (h1 text + chain) =====", flush=True)
    guarded("multimodal", multimodal)

    print("\n===== LP epoch sanity =====", flush=True)
    guarded("lp", lp)

    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
