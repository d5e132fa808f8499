"""Neighbour-sampled NC at scale, through the REAL task driver.

benchmarks/sampling_bench.py measures the host-side shape bound; this
script measures what that buys end-to-end: featureless mini-batch NC on a
hub-heavy graph through ``tasks/node_classification.run`` — full L-hop
expansion vs ``neighbor_fanout`` — reporting steady-state per-epoch wall
time and the padded edge totals the jitted step actually carries. Labels
are random (capacity/throughput measurement, not accuracy; loss sits at
chance).

Timing method: each arm warms its jit caches with one discarded
EPOCHS_LO run, then times the driver at EPOCHS_LO and at EPOCHS epochs
and reports the slope ``(t_hi - t_lo) / (EPOCHS - EPOCHS_LO)`` of the
driver's own "Training time" (the epoch loop alone, captured off the
task logger). Compiles land in the warmup; batch build, device
transfers and the exact final test eval sit OUTSIDE the captured span —
whole-process wall subtraction proved too noisy at scale (tens of
seconds of axon-transfer/test-eval jitter vs a seconds-scale signal).

Run: python benchmarks/sampled_nc_scale.py          (TPU)
     MRGCN_PLATFORM=cpu NODES=20000 python ...      (CPU smoke)

Env: NODES (default 320000) or SCALES=n1,n2,... for a sweep in one
process, BATCH (512), EPOCHS (10), EPOCHS_LO (2), FULL=0 skips the
full-expansion arm (at large NODES its padded batches are the point —
they grow with the graph).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mrgcn_tpu.utils.platform import apply_platform_override

apply_platform_override()

import numpy as np  # noqa: E402

from mrgcn_tpu.config import apply_defaults  # noqa: E402
from mrgcn_tpu.data.artifact import Artifact  # noqa: E402
from mrgcn_tpu.data.tsv import TSV  # noqa: E402
from mrgcn_tpu.tasks import node_classification  # noqa: E402

from benchmarks.sampling_bench import hub_graph  # noqa: E402

NODES = int(os.environ.get("NODES", "320000"))
BATCH = int(os.environ.get("BATCH", "512"))
EPOCHS = int(os.environ.get("EPOCHS", "10"))
EPOCHS_LO = int(os.environ.get("EPOCHS_LO", "2"))
CLASSES = 14
LABELLED = 2048
NUM_LAYERS = 2


def build_artifact(num_nodes):
    g = hub_graph(num_nodes, num_hubs=100, hub_degree=num_nodes // 40,
                  seed=7)
    rng = np.random.default_rng(11)
    nodes = rng.choice(num_nodes, LABELLED, replace=False)
    labels = rng.integers(0, CLASSES, LABELLED)
    # no "valid" split: per-epoch evaluation always expands fully (metric
    # exactness), which would put a graph-size-dependent term back into
    # the sampled arm's epoch slope; train-only epochs isolate what the
    # fan-out cap bounds. The final test eval runs in both timed arms and
    # cancels in the slope.
    splits = {"train": slice(0, LABELLED - 512),
              "test": slice(LABELLED - 512, LABELLED)}
    Y = {k: np.stack([nodes[s], labels[s]], axis=1).astype(np.int32)
         for k, s in splits.items()}
    sample_map = {k: [str(n) for n in nodes[s]] for k, s in splits.items()}
    class_map = [f"c{i}" for i in range(CLASSES)]
    return Artifact(g, F={}, Y=Y, data={}, sample_map=sample_map,
                    class_map=class_map)


def config(fanout, epochs):
    return apply_defaults({
        "name": "SAMPLED-SCALE",
        "graph": {"context": "", "train": "", "valid": "", "test": "",
                  "structural": {"include_inverse_properties": False,
                                 "exclude_properties": [],
                                 "separate_literals": False,
                                 "multiprocessing": False},
                  "features": []},
        "task": {"type": "node classification", "target_property": "",
                 "target_property_inv": "", "seed": 1,
                 "batchsize": BATCH,
                 "neighbor_fanout": fanout,
                 "early_stopping": {"patience": -1, "tolerance": 0.01}},
        "model": {"epoch": epochs, "learning_rate": 0.01, "num_bases": 0,
                  "p_dropout": 0.0, "weight_decay": 0.0, "l1_lambda": 0.0,
                  "l2_lambda": 0.0, "bias": False, "gates_lr": 0.01,
                  "layers": [{"type": "mrgcn", "hidden_nodes": 16},
                             {"type": "mrgcn"}]},
    })


def batch_shapes(art, fanout):
    """Replicates the driver's mini-batch construction
    (tasks/node_classification.make_batches:164-181) to report the padded
    shapes its jitted step carries — without touching a device."""
    from mrgcn_tpu.data import batching
    fan = (batching.normalize_fanout(fanout, NUM_LAYERS)
           if fanout not in (None, -1) else None)
    rng = np.random.default_rng(1)
    index = batching.EdgeIndex(art.structure)
    rows = art.Y["train"]
    t0 = time.perf_counter()
    padded_edges = outer_padded = nbatches = 0
    for begin in range(0, rows.shape[0], BATCH):
        uniq = np.unique(rows[begin:begin + BATCH, 0])
        mb = batching.sample_minibatch(index, uniq, NUM_LAYERS,
                                       fanout=fan, rng=rng)
        padded_edges += sum(len(np.asarray(eb.src))
                            for eb in mb.layer_edges)
        outer_padded += int(mb.layer_edges[0].num_in or 0)
        nbatches += 1
    return {"batches": nbatches, "padded_edges": int(padded_edges),
            "outer_nodes_padded": int(outer_padded),
            "build_s": round(time.perf_counter() - t0, 2)}


class _TrainTimeCapture(logging.Handler):
    """Grabs the NC driver's ``Training time: X.XXs`` log line — the
    epoch loop alone, excluding batch build / transfers / test eval."""

    def __init__(self):
        super().__init__()
        self.seconds = None

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Training time:"):
            self.seconds = float(msg.split(":")[1].strip().rstrip("s"))


def run_once(fanout, art, epochs):
    nc_logger = logging.getLogger("mrgcn_tpu.tasks.node_classification")
    prev_level = nc_logger.level
    cap = _TrainTimeCapture()
    nc_logger.addHandler(cap)
    nc_logger.setLevel(logging.INFO)
    t0 = time.perf_counter()
    try:
        tsv = TSV("/dev/null", "w", dry_run=True)
        out = node_classification.run(art, config(fanout, epochs), tsv,
                                      featureless=True, test_split="test",
                                      checkpoint=None, seed=1)
    finally:
        nc_logger.removeHandler(cap)
        nc_logger.setLevel(prev_level)
    wall = time.perf_counter() - t0
    assert cap.seconds is not None, "driver did not log Training time"
    return cap.seconds, wall, float(out[2])


def arm(tag, fanout, art, num_nodes):
    shapes = batch_shapes(art, fanout)
    run_once(fanout, art, EPOCHS_LO)       # warmup: compiles land here
    t_lo, wall_lo, _ = run_once(fanout, art, EPOCHS_LO)
    t_hi, wall_hi, loss = run_once(fanout, art, EPOCHS)
    slope = (t_hi - t_lo) / max(1, EPOCHS - EPOCHS_LO)
    print(json.dumps({"arm": tag, "fanout": fanout, "nodes": num_nodes,
                      "epochs": [EPOCHS_LO, EPOCHS],
                      "train_s": [round(t_lo, 3), round(t_hi, 3)],
                      "wall_s": [round(wall_lo, 2), round(wall_hi, 2)],
                      "per_epoch_s": round(slope, 4),
                      "loss": round(loss, 4), **shapes}), flush=True)


def main():
    scales = [int(s) for s in
              os.environ.get("SCALES", str(NODES)).split(",")]
    for num_nodes in scales:
        art = build_artifact(num_nodes)
        print(json.dumps({"nodes": num_nodes,
                          "edges": int(art.structure.num_edges),
                          "batch": BATCH, "labelled": LABELLED}),
              flush=True)
        arm("sampled", [15, 10], art, num_nodes)
        if os.environ.get("FULL", "1") != "0":
            arm("full", -1, art, num_nodes)


if __name__ == "__main__":
    main()
