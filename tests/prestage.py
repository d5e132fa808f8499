"""Synthetic stand-in graphs for the real dataset configs.

The mmkg datasets (AIFB..DMG, FB15k-237, ...) are not vendored in this
container, so each shipped config under ``configs/`` is pre-staged against
a small synthetic RDF graph that covers exactly the datatypes the config
enables — every feature block, merge rule, batching mode and optimizer
group the real run will exercise compiles and trains here; only the
``[graph]`` paths change when the real data lands
(gitlab.com/wxwilcke/mmkg).
"""

from __future__ import annotations

import base64
import io
import os
import random
from typing import Dict, List

from tests.synth import _fmt, _lit, _write_nt

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
OGC = "http://www.opengis.net/ont/geosparql#"
KGB = "http://kgbench.info/dt#"


def _png_b64(rng: random.Random) -> str:
    """A tiny valid PNG (the image vectorizer decodes real image bytes)."""
    from PIL import Image
    img = Image.new("RGB", (8, 8),
                    (rng.randrange(256), rng.randrange(256),
                     rng.randrange(256)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _literal_for(datatype: str, cls: int, rng: random.Random) -> str:
    if datatype == "xsd.numeric":
        v = rng.uniform(0, 0.4) if cls == 0 else rng.uniform(0.6, 1.0)
        return _lit(round(v, 4), "double")
    if datatype == "xsd.boolean":
        return _lit("true" if cls else "false", "boolean")
    if datatype == "xsd.string":
        return _lit(f"text sample {cls} {rng.randrange(5)}", "string")
    if datatype == "xsd.anyURI":
        return _lit(f"http://example.org/page/{cls}/{rng.randrange(5)}",
                    "anyURI")
    if datatype == "xsd.date":
        return _lit(f"19{50 + cls * 30 + rng.randrange(10)}-0"
                    f"{1 + rng.randrange(9)}-1{rng.randrange(9)}", "date")
    if datatype == "xsd.dateTime":
        return _lit(f"200{cls}-06-15T1{rng.randrange(9)}:30:00",
                    "dateTime")
    if datatype == "xsd.gYear":
        return _lit(1900 + cls * 60 + rng.randrange(30), "gYear")
    if datatype == "ogc.wktLiteral":
        x, y = rng.uniform(0, 10), rng.uniform(0, 10)
        pts = ", ".join(f"{x + i * 0.5:.2f} {y + (i % 3) * 0.3:.2f}"
                        for i in range(4 + rng.randrange(4)))
        return f'"LINESTRING ({pts})"^^<{OGC}wktLiteral>'
    if datatype == "blob.image":
        return f'"{_png_b64(rng)}"^^<{KGB}base64Image>'
    raise ValueError(datatype)


def make_dataset_for_config(config: Dict, dirpath: str,
                            num_entities: int = 48, seed: int = 7) -> Dict:
    """Generate context/train/valid/test N-Triples matching the config's
    enabled datatypes and task type; returns the path dict."""
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)
    datatypes = [f["datatype"]
                 for f in config["graph"].get("features", [])
                 if f.get("include")]
    task = config["task"]["type"]

    context: List[str] = []
    entities = [f"{EX}e{i}" for i in range(num_entities)]
    for i, e in enumerate(entities):
        cls = i % 2
        for dt in datatypes:
            prop = EX + "has" + dt.replace(".", "_")
            context.append(
                f"{_fmt(e)} {_fmt(prop)} {_literal_for(dt, cls, rng)}")
        for _ in range(2):
            j = rng.randrange(num_entities)
            context.append(f"{_fmt(e)} {_fmt(EX + 'linksTo')} "
                           f"{_fmt(entities[j])}")

    paths: Dict[str, str] = {}
    if task == "node classification":
        targets = [f"{_fmt(e)} {_fmt(EX + 'hasClass')} "
                   f"{_fmt(EX + f'c{i % 2}')}"
                   for i, e in enumerate(entities)]
        rng.shuffle(targets)
        n_tr = int(0.6 * num_entities)
        n_va = int(0.2 * num_entities)
        splits = {"train": targets[:n_tr],
                  "valid": targets[n_tr:n_tr + n_va],
                  "test": targets[n_tr + n_va:]}
        paths["context"] = os.path.join(dirpath, "context.nt.gz")
        _write_nt(paths["context"], context)
        for split, lines in splits.items():
            paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
            _write_nt(paths[split], lines)
    else:  # link prediction: facts split across train/valid/test
        rng.shuffle(context)
        n_tr = int(0.8 * len(context))
        n_va = int(0.1 * len(context))
        splits = {"train": context[:n_tr],
                  "valid": context[n_tr:n_tr + n_va],
                  "test": context[n_tr + n_va:]}
        for split, lines in splits.items():
            paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
            _write_nt(paths[split], lines)
    return paths
