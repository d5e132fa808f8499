"""One-shot TPU confirmation batch (round 4, final): the three headline
regimes on the round-4 default paths, one process, plus bench.py's exact
workload — the numbers the round snapshot should show.

Run:  python benchmarks/tpu_batch_r4g.py  (fresh process only)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def report(tag, payload):
    RESULTS[tag] = payload
    print(tag, json.dumps(payload), flush=True)


def guarded(name, fn):
    try:
        fn()
    except Exception as exc:
        report(name + "_error", f"{type(exc).__name__}: {exc}")


def headline():
    from bench import run_jax_epochs
    from benchmarks.torch_baseline import build_workload
    report("featureless_nc_epoch_s",
           round(run_jax_epochs(build_workload()), 6))


def multimodal():
    from benchmarks.bench_suite import bench_multimodal
    report("multimodal_nc_epoch_s", round(bench_multimodal(), 6))


def lp():
    from benchmarks.bench_suite import bench_lp
    epoch, t_rank = bench_lp()
    report("lp_epoch_s", round(epoch, 6))
    report("lp_rank_chunk_s", round(t_rank, 6))


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("headline", headline)
    guarded("multimodal", multimodal)
    guarded("lp", lp)
    print("FINAL_R4G", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
