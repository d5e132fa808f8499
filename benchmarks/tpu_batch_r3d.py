"""Resume batch: everything tpu_batch_r3b/r3c still owes (round 3).

The r3b run on 2026-08-18 08:23 completed micro_bwd_parts and
micro_compose_bwd_variants (results preserved in docs/session_r3.md)
before the driving session died.  This batch runs the remainder plus the
two staged r3c diagnostics:

  1. fused compose-bwd step OFF vs ON      (flip-default decision)
  2. micro_multimodal_parts
  3. lp_parts            -> FINAL_LP       (LP lever decision)
  4. lp_stream_trial     -> FINAL_LP_STREAM
  5. bench_lp (full epoch on current defaults)
  6. micro_layer2_parts  (21.7 ms dense output layer decomposition)
  7. micro_text_bwd_parts

Run:  python benchmarks/tpu_batch_r3d.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import (  # noqa: E402
    guarded, lp_parts, lp_stream_trial, run_script, step_time_with_flag,
)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== fused compose-bwd step =====", flush=True)
    off = guarded("step_fused_off", step_time_with_flag, "0")
    if off is not None:
        print(json.dumps({"step_fused_off_ms": round(off, 3)}), flush=True)
    on = guarded("step_fused_on", step_time_with_flag, "1")
    if on is not None:
        print(json.dumps({"step_fused_on_ms": round(on, 3)}), flush=True)

    print("\n===== LP step decomposition =====", flush=True)
    guarded("lp_parts", lp_parts)

    print("\n===== LP stream-engine trial =====", flush=True)
    guarded("lp_stream_trial", lp_stream_trial)

    print("\n===== LP full epoch (current defaults) =====", flush=True)

    def _bench_lp():
        from benchmarks.bench_suite import bench_lp
        epoch, t_rank = bench_lp()
        print(json.dumps({"lp_epoch_s": round(float(epoch), 4),
                          "lp_rank_chunk_s": round(float(t_rank), 5)}),
              flush=True)
    guarded("bench_lp", _bench_lp)

    guarded("micro_layer2_parts", run_script, "micro_layer2_parts")
    guarded("micro_multimodal_parts", run_script, "micro_multimodal_parts")
    guarded("micro_text_bwd_parts", run_script, "micro_text_bwd_parts")
    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
