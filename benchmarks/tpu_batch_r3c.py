"""Second TPU experiment batch (round 3, resumed session).

Follow-ups staged after tpu_batch_r3b's results landed:

  1. micro_layer2_parts    — decompose the dense output layer
     (21.6 ms of the 58.7 ms featureless step for the SMALLEST layer)
  2. micro_text_bwd_parts  — text-encoder backward wall decomposition
     + num_heads sweep (head_dim 32 pads attention matmuls 4x on MXU)

Run:  python benchmarks/tpu_batch_r3c.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.tpu_batch_r3b import guarded, run_script  # noqa: E402


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    guarded("micro_layer2_parts", run_script, "micro_layer2_parts")
    guarded("micro_text_bwd_parts", run_script, "micro_text_bwd_parts")


if __name__ == "__main__":
    sys.exit(main() or 0)
