"""Regenerate the bundled smoke-test datasets and configs.

Run from the repository root:

    python tests/tasks/regenerate.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import synth  # noqa: E402


def _tv(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return f"'{v}'"


def emit_toml(cfg, path, lp=False):
    lines = [f"name = {_tv(cfg['name'])}", "", "[graph]"]
    keys = ("train", "valid", "test") if lp else ("context", "train",
                                                  "valid", "test")
    for k in keys:
        lines.append(f"{k} = {_tv(cfg['graph'][k])}")
    lines.append("\n[graph.structural]")
    for k, v in cfg["graph"]["structural"].items():
        lines.append(f"{k} = {_tv(v) if not isinstance(v, list) else '[]'}")
    for f in cfg["graph"].get("features", []):
        lines.append("\n[[graph.features]]")
        for k, v in f.items():
            lines.append(f"{k} = {_tv(v)}")
    lines.append("\n[task]")
    for k, v in cfg["task"].items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                lines.append(f"{k}.{k2} = {_tv(v2)}")
        else:
            lines.append(f"{k} = {_tv(v)}")
    lines.append("\n[model]")
    for k, v in cfg["model"].items():
        if k == "layers":
            continue
        lines.append(f"{k} = {_tv(v)}")
    for layer in cfg["model"]["layers"]:
        lines.append("\n[[model.layers]]")
        for k, v in layer.items():
            lines.append(f"{k} = {_tv(v)}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    cl_dir = os.path.join(REPO, "tests", "tasks", "classification")
    paths = synth.make_nc_dataset(cl_dir, num_entities=100,
                                  with_strings=True, seed=11)
    rel = {k: f"./tests/tasks/classification/{os.path.basename(v)}"
           for k, v in paths.items()}
    cfg = synth.nc_config(rel, name="CLTEST", with_strings=True, epochs=10)
    emit_toml(cfg, os.path.join(cl_dir, "config.toml"))

    lp_dir = os.path.join(REPO, "tests", "tasks", "linkprediction")
    paths = synth.make_lp_dataset(lp_dir, num_entities=60, seed=12)
    rel = {k: f"./tests/tasks/linkprediction/{os.path.basename(v)}"
           for k, v in paths.items()}
    cfg = synth.lp_config(rel, name="LPTEST", epochs=10)
    cfg["task"]["eval_interval"] = 1
    emit_toml(cfg, os.path.join(lp_dir, "config.toml"), lp=True)
    print("regenerated tests/tasks/{classification,linkprediction}")


if __name__ == "__main__":
    main()
