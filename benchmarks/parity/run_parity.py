"""Accuracy/MRR parity harness: reference implementation vs mrgcn_tpu.

Runs BOTH implementations on identical synthetic datasets with identical
hyperparameters and compares final test metrics (the north-star target is
agreement within +-0.05 accuracy / MRR). The reference runs against a
minimal rdflib/toml shim (see ``shims/``) since rdflib is not installed.

Usage (from the repo root):
    python benchmarks/parity/run_parity.py [--task nc|lp|all]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = "/root/reference"
SHIMS = os.path.join(HERE, "shims")


def run(cmd, cwd=None, env=None, timeout=3600) -> str:
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{proc.stdout[-2000:]}"
                           f"\n{proc.stderr[-4000:]}")
    return proc.stdout + proc.stderr


def run_reference(config: str, out_dir: str, task: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS + ":" + REFERENCE
    env.pop("JAX_PLATFORMS", None)

    out = run([sys.executable, "mrgcn/mkdataset.py", "-c", config,
               "-o", out_dir + "/"], cwd=REFERENCE, env=env)
    tar = max((os.path.join(out_dir, f) for f in os.listdir(out_dir)
               if f.endswith(".tar")), key=os.path.getmtime)

    out = run([sys.executable, "mrgcn/run.py", "-c", config, "-i", tar,
               "-o", out_dir + "/", "--test", "--dry_run"],
              cwd=REFERENCE, env=env)
    return parse_metrics(out, task)


def run_ours(config: str, out_dir: str, task: str) -> dict:
    env = dict(os.environ)
    env["MRGCN_PLATFORM"] = env.get("MRGCN_PARITY_PLATFORM", "cpu")

    out = run([sys.executable, "-m", "mrgcn_tpu.mkdataset", "-c", config,
               "-o", out_dir + "/"], cwd=REPO, env=env)
    npz = max((os.path.join(out_dir, f) for f in os.listdir(out_dir)
               if f.endswith(".npz")), key=os.path.getmtime)

    out = run([sys.executable, "-m", "mrgcn_tpu.run", "-c", config,
               "-i", npz, "-o", out_dir + "/", "--test", "--dry_run"],
              cwd=REPO, env=env)
    return parse_metrics(out, task)


def parse_metrics(output: str, task: str) -> dict:
    if task == "nc":
        m = re.search(r"loss ([\d.]+) / accuracy ([\d.]+)", output)
        if not m:
            raise RuntimeError(f"no NC metrics in output:\n{output[-2000:]}")
        return {"loss": float(m.group(1)), "accuracy": float(m.group(2))}
    m = re.search(
        r"MRR \(raw\) ([\d.]+).*?H@10 ([\d.]+)(?:.*?MRR \(filtered\) "
        r"([\d.]+).*?H@10 ([\d.]+))?", output, re.DOTALL)
    if not m:
        raise RuntimeError(f"no LP metrics in output:\n{output[-2000:]}")
    out = {"mrr_raw": float(m.group(1)), "hits10_raw": float(m.group(2))}
    if m.group(3):
        out["mrr_flt"] = float(m.group(3))
        out["hits10_flt"] = float(m.group(4))
    return out


def _with_seed(config: str, seed: int, out_dir: str) -> str:
    text = open(config).read()
    text = text.replace("seed = 1", f"seed = {seed}")
    path = os.path.join(out_dir, os.path.basename(config))
    with open(path, "w") as f:
        f.write(text)
    return path


def _mean(dicts):
    keys = dicts[0].keys()
    return {k: round(sum(d[k] for d in dicts) / len(dicts), 4)
            for k in keys}


def _std(dicts):
    import math
    keys = dicts[0].keys()
    out = {}
    for k in keys:
        vals = [d[k] for d in dicts]
        mu = sum(vals) / len(vals)
        out[k] = round(math.sqrt(sum((v - mu) ** 2 for v in vals)
                                 / max(1, len(vals) - 1)), 4)
    return out


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", choices=("nc", "lp", "all"), default="all")
    parser.add_argument("--seeds", type=int, default=3,
                        help="LP runs are averaged over this many seeds — "
                        "the smoke split has 36 test facts, so a single "
                        "run's MRR varies by ~0.1 with the init draw")
    parser.add_argument("--big", action="store_true",
                        help="use the large decisive-parity datasets under "
                        "benchmarks/parity/big/ (generate with gen_big.py); "
                        "NC is seed-averaged too in this mode")
    args = parser.parse_args()

    tasks = ["nc", "lp"] if args.task == "all" else [args.task]
    results = {}
    for task in tasks:
        cfg_dir = os.path.join(HERE, "big") if args.big else HERE
        config = os.path.join(cfg_dir, f"{task}_config.toml")
        seeds = range(1, args.seeds + 1) \
            if (task == "lp" or args.big) else [1]
        refs, ours_all = [], []
        for seed in seeds:
            with tempfile.TemporaryDirectory() as ref_dir, \
                    tempfile.TemporaryDirectory() as our_dir:
                cfg = _with_seed(config, seed, our_dir)
                refs.append(run_reference(cfg, ref_dir, task))
                ours_all.append(run_ours(cfg, our_dir, task))
                print(f"[{task} seed {seed}] ref={refs[-1]} "
                      f"ours={ours_all[-1]}", flush=True)
        results[task] = {"reference": _mean(refs),
                         "reference_std": _std(refs),
                         "mrgcn_tpu": _mean(ours_all),
                         "mrgcn_tpu_std": _std(ours_all),
                         "runs": len(refs)}
        print(f"[{task}] reference: {results[task]['reference']}"
              f" +- {results[task]['reference_std']}")
        print(f"[{task}] mrgcn_tpu: {results[task]['mrgcn_tpu']}"
              f" +- {results[task]['mrgcn_tpu_std']}")

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
