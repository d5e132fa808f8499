"""ETL (mkdataset) benchmark at DMG scale, ours vs the reference.

SURVEY §3.1: the reference's dominant ETL costs are rdflib triple
iteration and per-literal Python encoding loops
(reference: mrgcn/encodings/graph_structure.py:78-134, per-literal loops
e.g. encodings/xsd/numeric.py:114-138). This benchmark generates one
synthetic graph at DMG-like magnitudes (default 20k entities, 100k+
literals across five modalities) and times the full mkdataset pipeline
(parse -> structure -> vectorize -> merge -> artifact) through BOTH CLIs:

  * ours        — `python -m mrgcn_tpu.mkdataset`
  * reference   — `mrgcn/mkdataset.py` against the rdflib/toml shims
                  (benchmarks/parity/shims), restricted to the modalities
                  runnable without downloads (numeric, boolean, date,
                  dateTime, gYear)

plus a multimodal ours-only run adding string/image/WKT (the reference
needs HF downloads / deep_geometry for those).

Prints one JSON line per stage.  Run: python benchmarks/etl_bench.py
[--entities 20000] [--skip-reference] [--skip-multimodal]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REFERENCE = "/root/reference"
SHIMS = os.path.join(HERE, "parity", "shims")
sys.path.insert(0, REPO)

from tests.prestage import _literal_for  # noqa: E402
from tests.synth import EX, _fmt, _write_nt  # noqa: E402

CPU_DATATYPES = ["xsd.numeric", "xsd.boolean", "xsd.date", "xsd.dateTime",
                 "xsd.gYear"]
FULL_DATATYPES = CPU_DATATYPES + ["xsd.string", "ogc.wktLiteral",
                                  "blob.image"]


def make_graph(dirpath: str, num_entities: int, datatypes, seed=7,
               image_every=3, wkt_every=3) -> dict:
    """DMG-like NC graph: one literal per enabled datatype per entity
    (images/WKT on every ``image_every``th/``wkt_every``th entity), two
    structural edges per entity, binary targets."""
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)
    context, n_lit = [], 0
    for i in range(num_entities):
        e = f"{EX}e{i}"
        cls = i % 2
        for dt in datatypes:
            if dt == "blob.image" and i % image_every:
                continue
            if dt == "ogc.wktLiteral" and i % wkt_every:
                continue
            prop = EX + "has" + dt.replace(".", "_")
            context.append(
                f"{_fmt(e)} {_fmt(prop)} {_literal_for(dt, cls, rng)}")
            n_lit += 1
        for _ in range(2):
            j = rng.randrange(num_entities)
            context.append(f"{_fmt(e)} {_fmt(EX + 'linksTo')} "
                           f"{_fmt(EX + f'e{j}')}")

    targets = [f"{_fmt(EX + f'e{i}')} {_fmt(EX + 'hasClass')} "
               f"{_fmt(EX + f'c{i % 2}')}" for i in range(num_entities)]
    rng.shuffle(targets)
    n_tr, n_va = int(0.6 * num_entities), int(0.2 * num_entities)
    paths = {"context": os.path.join(dirpath, "context.nt.gz")}
    _write_nt(paths["context"], context)
    for split, lines in (("train", targets[:n_tr]),
                         ("valid", targets[n_tr:n_tr + n_va]),
                         ("test", targets[n_tr + n_va:])):
        paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
        _write_nt(paths[split], lines)
    return {"paths": paths, "num_triples": len(context) + num_entities,
            "num_literals": n_lit}


def write_config(path: str, paths: dict, datatypes) -> None:
    blocks = []
    for dt in datatypes:
        shared = "true" if dt != "xsd.numeric" else "false"
        extra = ""
        if dt in ("xsd.string", "xsd.anyURI"):
            extra = ("tokenizer.config = []\ntokenizer.pad_token = ''\n"
                     "model = []\n")
        if dt == "blob.image":
            extra = ("model = []\n"
                     "transform.mode = 'RGB'\n"
                     "transform.interpolationMode = 'BILINEAR'\n"
                     "transform.resizeSize = 32\n"
                     "transform.centerCrop = 32\n"
                     "transform.mean = [0.485, 0.456, 0.406]\n"
                     "transform.std = [0.229, 0.224, 0.225]\n")
        blocks.append(f"""[[graph.features]]
datatype = '{dt}'
include = true
share_weights = {shared}
embedding_dim = 4
p_dropout = 0.0
p_noise = 0.0
noise_multiplier = 0.0
gpu_acceleration = false
{extra}""")
    features = "\n".join(blocks)
    cfg = f"""name = "ETLBENCH"

[graph]
context = "{paths['context']}"
train = "{paths['train']}"
valid = "{paths['valid']}"
test = "{paths['test']}"

[graph.structural]
include_inverse_properties = true
exclude_properties = []
separate_literals = false
multiprocessing = false

{features}
[task]
type = "node classification"
target_property = 'http://example.org/hasClass'
target_property_inv = ''
seed = 1
batchsize = -1

[model]
epoch = 1
learning_rate = 0.01
num_bases = 0
p_dropout = 0.0
weight_decay = 0.0
l1_lambda = 0.0
l2_lambda = 0.0
bias = false
gates_lr = 0.01

[[model.layers]]
type = 'mrgcn'
hidden_nodes = 16

[[model.layers]]
type = 'mrgcn'
"""
    with open(path, "w") as f:
        f.write(cfg)


def timed_cli(cmd, cwd, env) -> float:
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=3600)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n"
                           f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=20_000)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--skip-multimodal", action="store_true")
    args = ap.parse_args()

    results = {}

    def report(name, value):
        results[name] = round(value, 3) if isinstance(value, float) else value
        print(json.dumps({name: results[name]}), flush=True)

    # the axon sitecustomize imports jax in EVERY python process (~10 s);
    # both CLIs pay it identically — report it so work-time speedups can
    # be quoted alongside wall-clock ones
    report("interpreter_overhead_s", timed_cli(
        [sys.executable, "-c", "pass"], REPO, dict(os.environ)))

    with tempfile.TemporaryDirectory() as td:
        # ---- CPU-modalities graph (runnable through the reference) -------
        g = make_graph(os.path.join(td, "cpu"), args.entities,
                       CPU_DATATYPES)
        report("cpu_graph_triples", g["num_triples"])
        report("cpu_graph_literals", g["num_literals"])
        cfg = os.path.join(td, "etl_cpu.toml")
        write_config(cfg, g["paths"], CPU_DATATYPES)

        out_ours = os.path.join(td, "out_ours")
        os.makedirs(out_ours)
        env = dict(os.environ)
        env["MRGCN_PLATFORM"] = "cpu"
        report("ours_cpu_modalities_s", timed_cli(
            [sys.executable, "-m", "mrgcn_tpu.mkdataset", "-c", cfg,
             "-o", out_ours + "/"], REPO, env))

        if not args.skip_reference:
            out_ref = os.path.join(td, "out_ref")
            os.makedirs(out_ref)
            env_ref = dict(os.environ)
            env_ref["PYTHONPATH"] = SHIMS + ":" + REFERENCE
            env_ref.pop("JAX_PLATFORMS", None)
            report("reference_cpu_modalities_s", timed_cli(
                [sys.executable, "mrgcn/mkdataset.py", "-c", cfg,
                 "-o", out_ref + "/"], REFERENCE, env_ref))
            report("etl_speedup_vs_reference",
                   results["reference_cpu_modalities_s"]
                   / results["ours_cpu_modalities_s"])
            # both CLIs pay the identical sitecustomize interpreter
            # start-up; the work-time ratio is the ETL comparison
            ov = results["interpreter_overhead_s"]
            report("etl_worktime_speedup_vs_reference",
                   max(results["reference_cpu_modalities_s"] - ov, 1e-9)
                   / max(results["ours_cpu_modalities_s"] - ov, 1e-9))

        # ---- full-multimodal graph (ours only) ----------------------------
        if not args.skip_multimodal:
            g2 = make_graph(os.path.join(td, "full"), args.entities,
                            FULL_DATATYPES)
            report("full_graph_triples", g2["num_triples"])
            report("full_graph_literals", g2["num_literals"])
            cfg2 = os.path.join(td, "etl_full.toml")
            write_config(cfg2, g2["paths"], FULL_DATATYPES)
            out2 = os.path.join(td, "out_full")
            os.makedirs(out2)
            report("ours_full_multimodal_s", timed_cli(
                [sys.executable, "-m", "mrgcn_tpu.mkdataset", "-c", cfg2,
                 "-o", out2 + "/"], REPO, env))

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
