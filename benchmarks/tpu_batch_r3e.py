"""Re-measure the fwd+bwd numbers invalidated by the DCE foot-gun.

The first FINAL_LP / FINAL_L2 runs measured several backward passes with
``value_and_grad(...)(x)[0]`` — the harness only forces returned leaves,
so XLA dead-code-eliminated the XLA-path backwards (fwd_bwd == fwd was
the tell; Pallas custom_calls survived, skewing every stream-vs-XLA
comparison).  tpu_batch_r3b.py and micro_layer2_parts.py are fixed to
return the full (value, grad) tuple; this batch re-runs just the
affected experiments:

  1. lp_parts          -> FINAL_LP        (LP lever decision, now honest)
  2. lp_stream_trial   -> FINAL_LP_STREAM (grouped baseline was fwd-only)
  3. micro_layer2_parts -> FINAL_L2       (grouped_fwd_bwd was fwd-only)

Run:  python benchmarks/tpu_batch_r3e.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import (  # noqa: E402
    guarded, lp_parts, lp_stream_trial, run_script,
)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    print("\n===== LP step decomposition (DCE-fixed) =====", flush=True)
    guarded("lp_parts", lp_parts)

    print("\n===== LP stream-engine trial (DCE-fixed) =====", flush=True)
    guarded("lp_stream_trial", lp_stream_trial)

    guarded("micro_layer2_parts", run_script, "micro_layer2_parts")
    print("\n===== BATCH DONE =====", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
