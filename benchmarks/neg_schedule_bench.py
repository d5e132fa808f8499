"""Negative-sample scheduling A/B: MRR-per-epoch on a synthetic LP graph.

Measures the semantic value of the round-5 LP knobs (the kernel story is
closed at these scales — docs/SATURATION.md): same epoch budget, same
seeds, three regimes:

  base  — reference semantics (ratio 0.2, uniform)
  dense — ratio 1.0, uniform          (5x negatives per step)
  adv   — ratio 1.0, self-adversarial temperature 1.0 (RotatE-style)

Run: MRGCN_PLATFORM=cpu python benchmarks/neg_schedule_bench.py
(MRGCN_NEG_EPOCHS overrides the epoch budget, default 40)

Measured round 5 AFTER the corruptor weighted-slot fix (d3394ec; the
pre-fix A/B trained dense/adv on partly-garbage negatives and wrongly
favoured the default — numbers in BENCH_EXTENDED.md "LP negative-sample
scheduling"): at 40 epochs dense/adv reach ~1.5x the default's filtered
MRR (0.088/0.082 vs 0.060) — faster convergence per epoch; at 200
epochs the regimes statistically tie (0.095/0.114 vs 0.107), with
self-adversarial nominally best and lowest variance. Knobs ship
default-off (ratio 0.2 ≡ reference bit-exact) for parity.
"""

import copy
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mrgcn_tpu.utils.platform import apply_platform_override

apply_platform_override()

import numpy as np  # noqa: E402

from mrgcn_tpu.config import apply_defaults  # noqa: E402
from mrgcn_tpu.data import artifact as artifact_io  # noqa: E402
from mrgcn_tpu.data.tsv import TSV  # noqa: E402
from mrgcn_tpu.mkdataset import build  # noqa: E402
from mrgcn_tpu.tasks import link_prediction  # noqa: E402

from tests import synth  # noqa: E402

EPOCHS = int(os.environ.get("MRGCN_NEG_EPOCHS", "40"))
SEEDS = (3, 11, 29)
REGIMES = {
    "base": {},
    "dense": {"negative_sampling_ratio": 1.0},
    "adv": {"negative_sampling_ratio": 1.0,
            "negative_adversarial_temperature": 1.0},
}


def main():
    with tempfile.TemporaryDirectory() as d:
        paths = synth.make_lp_dataset(d, num_entities=200)
        config = apply_defaults(synth.lp_config(paths, epochs=EPOCHS))
        A, F, Y, data, sample_map, class_map = build(config)
        path = os.path.join(d, "ds.npz")
        artifact_io.save(path, A, F, Y=Y, data=data,
                         sample_map=sample_map, class_map=class_map)
        art = artifact_io.load(path)

        results = {}
        for name, overrides in REGIMES.items():
            mrrs = []
            for seed in SEEDS:
                cfg = copy.deepcopy(config)
                cfg["task"].update(overrides)
                tsv = TSV("/dev/null", "w", dry_run=True)
                _, _, loss, mrr, hits, _ = link_prediction.run(
                    art, cfg, tsv, featureless=True, test_split="test",
                    checkpoint=None, seed=seed)
                mrrs.append(mrr["flt"] if "flt" in mrr else mrr["raw"])
            results[name] = {"mrr_mean": float(np.mean(mrrs)),
                             "mrr_std": float(np.std(mrrs)),
                             "per_seed": [float(m) for m in mrrs]}
            print(f"{name:6s} filtered-MRR {np.mean(mrrs):.4f} "
                  f"+- {np.std(mrrs):.4f}  {results[name]['per_seed']}")
        print(json.dumps({"epochs": EPOCHS, "seeds": list(SEEDS),
                          **results}))


if __name__ == "__main__":
    main()
