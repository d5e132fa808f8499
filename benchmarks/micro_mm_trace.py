"""Profile the multimodal train step: where do the 495 ms fwd+bwd go?

micro_mm_attrib attributed by modality subtraction (text 213 ms, image
173 ms, graph 50 ms) but the standalone text encoder measures 117 ms —
~100 ms of in-model text cost is unexplained. This captures a
jax.profiler trace of the full-step grad and prints the top ops by
self time from the trace events, so the gap gets a name (a layout copy,
an unfused transpose, a rematerialised attention, ...).

Run:  python benchmarks/micro_mm_trace.py [outdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.micro_mm_attrib import build_step  # noqa: E402


def main():
    import jax

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mm_trace"
    step, params = build_step()
    g = jax.jit(step)
    jax.block_until_ready(g(params))  # compile outside the trace

    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = g(params)
        jax.block_until_ready(out)

    # summarize: the trace is a gzipped chrome trace under
    # <outdir>/plugins/profile/<ts>/*.trace.json.gz
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        print("no trace file found under", outdir)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    durs = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        # keep device-side op events only (they carry run ids in args)
        durs[name] = durs.get(name, 0.0) + ev["dur"]
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
    for name, us in top:
        print(json.dumps({"op": name[:120], "total_ms": round(us / 3e3, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
