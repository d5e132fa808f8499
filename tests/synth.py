"""Synthetic multimodal RDF dataset generators for end-to-end tests.

Mirrors the reference's test strategy (reference:
tests/tasks/classification/README.md): randomly wired graphs whose *only*
class signal lives in the literal features, so a featureless model cannot
beat chance but a multimodal model can.
"""

from __future__ import annotations

import gzip
import os
import random
from typing import Dict, List

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _fmt(term: str) -> str:
    return f"<{term}>"


def _lit(value, dtype: str = None, lang: str = None) -> str:
    s = str(value).replace("\\", "\\\\").replace('"', '\\"')
    if dtype:
        return f'"{s}"^^<{XSD}{dtype}>'
    if lang:
        return f'"{s}"@{lang}'
    return f'"{s}"'


def _write_nt(path: str, lines: List[str]) -> None:
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for line in lines:
            f.write(line + " .\n")


def make_nc_dataset(dirpath: str, num_entities: int = 60,
                    with_strings: bool = False, seed: int = 42) -> Dict:
    """Binary node classification with numeric/gYear (optionally string)
    class signal. Returns the config dict paths."""
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)

    context: List[str] = []
    targets: List[str] = []
    for i in range(num_entities):
        e = f"{EX}e{i}"
        cls = i % 2
        targets.append(
            f"{_fmt(e)} {_fmt(EX + 'hasClass')} {_fmt(EX + f'c{cls}')}")

        value = rng.uniform(0.0, 0.4) if cls == 0 else rng.uniform(0.6, 1.0)
        context.append(f"{_fmt(e)} {_fmt(EX + 'hasValue')} "
                       f"{_lit(round(value, 4), 'double')}")
        year = rng.randint(1900, 1949) if cls == 0 else rng.randint(1960,
                                                                    2009)
        context.append(f"{_fmt(e)} {_fmt(EX + 'hasYear')} "
                       f"{_lit(year, 'gYear')}")
        if with_strings:
            word = "alpha common text" if cls == 0 else "beta common text"
            context.append(f"{_fmt(e)} {_fmt(EX + 'hasName')} "
                           f"{_lit(word, 'string')}")

        # random structural noise edges
        for _ in range(2):
            j = rng.randrange(num_entities)
            context.append(f"{_fmt(e)} {_fmt(EX + 'linksTo')} "
                           f"{_fmt(EX + f'e{j}')}")

    rng.shuffle(targets)
    n_train = int(0.6 * num_entities)
    n_valid = int(0.2 * num_entities)
    splits = {
        "train": targets[:n_train],
        "valid": targets[n_train:n_train + n_valid],
        "test": targets[n_train + n_valid:],
    }

    paths = {"context": os.path.join(dirpath, "context.nt.gz")}
    _write_nt(paths["context"], context)
    for split, lines in splits.items():
        paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
        _write_nt(paths[split], lines)
    return paths


def nc_config(paths: Dict, name: str = "SYNTH-NC",
              with_strings: bool = False, epochs: int = 40,
              seed: int = 1) -> Dict:
    features = [
        {"datatype": "xsd.numeric", "include": True, "share_weights": False,
         "embedding_dim": 4, "p_dropout": 0.0},
        {"datatype": "xsd.gYear", "include": True, "share_weights": True,
         "embedding_dim": 4, "p_dropout": 0.0},
        {"datatype": "xsd.string", "include": with_strings,
         "share_weights": True, "embedding_dim": 8, "p_dropout": 0.0},
    ]
    return {
        "name": name,
        "graph": {
            "context": paths["context"],
            "train": paths["train"],
            "valid": paths["valid"],
            "test": paths["test"],
            "structural": {
                "include_inverse_properties": True,
                "exclude_properties": [],
                "separate_literals": False,
                "multiprocessing": False,
            },
            "features": features,
        },
        "task": {
            "type": "node classification",
            "target_property": EX + "hasClass",
            "target_property_inv": "",
            "seed": seed,
            "batchsize": -1,
            "early_stopping": {"patience": -1, "tolerance": 0.01},
        },
        "model": {
            "epoch": epochs,
            "learning_rate": 0.01,
            "num_bases": 0,
            "p_dropout": 0.0,
            "weight_decay": 0.0,
            "l1_lambda": 0.0,
            "l2_lambda": 0.0,
            "bias": False,
            "gates_lr": 0.05,
            "layers": [
                {"type": "mrgcn", "hidden_nodes": 16},
                {"type": "mrgcn"},
            ],
        },
    }


def full_mm_features(image_size: int = 32) -> List[Dict]:
    """One feature block per encoder family — MLP1 (numeric, boolean),
    MLP2 (date, gYear), text (string), TCNN (wktLiteral), CNN (image) —
    so a config built on these exercises every modality encoder."""
    return [
        {"datatype": "xsd.numeric", "include": True,
         "share_weights": False, "embedding_dim": 4, "p_dropout": 0.0},
        {"datatype": "xsd.boolean", "include": True,
         "share_weights": True, "embedding_dim": 2, "p_dropout": 0.0},
        {"datatype": "xsd.date", "include": True,
         "share_weights": True, "embedding_dim": 3, "p_dropout": 0.0},
        {"datatype": "xsd.gYear", "include": True,
         "share_weights": True, "embedding_dim": 4, "p_dropout": 0.0},
        {"datatype": "xsd.string", "include": True,
         "share_weights": True, "embedding_dim": 8, "p_dropout": 0.0},
        {"datatype": "ogc.wktLiteral", "include": True,
         "share_weights": True, "embedding_dim": 8, "p_dropout": 0.0},
        {"datatype": "blob.image", "include": True,
         "share_weights": True, "embedding_dim": 8, "p_dropout": 0.0,
         "transform": {"mode": "RGB", "interpolationMode": "BILINEAR",
                       "resizeSize": image_size + 4,
                       "centerCrop": image_size}},
    ]


def make_full_mm_nc(dirpath: str, num_entities: int = 48,
                    seed: int = 7, epochs: int = 6):
    """Full-multimodal node classification: dataset + config covering all
    six encoder families (string/image/WKT included — the modalities the
    round-4 mesh coverage never ran). Returns ``(paths, config)``; the
    config still needs ``mrgcn_tpu.config.apply_defaults``."""
    from tests import prestage

    config = nc_config({"context": "", "train": "", "valid": "",
                        "test": ""}, name="SYNTH-MM-NC", epochs=epochs)
    config["graph"]["features"] = full_mm_features()
    paths = prestage.make_dataset_for_config(config, dirpath,
                                             num_entities=num_entities,
                                             seed=seed)
    config["graph"].update(paths)
    return paths, config


def make_lp_dataset(dirpath: str, num_entities: int = 40,
                    with_literals: bool = False, seed: int = 7) -> Dict:
    """Small link-prediction KG with structured relations; optionally with
    numeric literal annotations (multimodal LP)."""
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)

    triples: List[str] = []
    seen = set()
    # ring + clustered structure so embeddings carry signal
    for i in range(num_entities):
        for rel, j in (("next", (i + 1) % num_entities),
                       ("group", i % 5),
                       ("friend", (i * 7) % num_entities)):
            key = (i, rel, j)
            if key in seen:
                continue
            seen.add(key)
            triples.append(f"{_fmt(EX + f'e{i}')} {_fmt(EX + rel)} "
                           f"{_fmt(EX + f'e{j}')}")
        if with_literals:
            triples.append(
                f"{_fmt(EX + f'e{i}')} {_fmt(EX + 'hasScore')} "
                f"{_lit(round(i / num_entities, 3), 'double')}")

    rng.shuffle(triples)
    n = len(triples)
    splits = {
        "train": triples[:int(0.8 * n)],
        "valid": triples[int(0.8 * n):int(0.9 * n)],
        "test": triples[int(0.9 * n):],
    }
    paths = {}
    for split, lines in splits.items():
        paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
        _write_nt(paths[split], lines)
    return paths


def lp_config(paths: Dict, name: str = "SYNTH-LP", epochs: int = 30,
              seed: int = 1) -> Dict:
    return {
        "name": name,
        "graph": {
            "train": paths["train"],
            "valid": paths["valid"],
            "test": paths["test"],
            "structural": {
                "include_inverse_properties": True,
                "exclude_properties": [],
                "separate_literals": False,
                "multiprocessing": False,
            },
            "features": [],
        },
        "task": {
            "type": "link prediction",
            "target_property": "",
            "target_property_inv": "",
            "seed": seed,
            "gcn_batchsize": -1,
            "test_batchsize": -1,
            "mrr_batchsize": 50,
            "eval_interval": 10,
            "filter_ranks": True,
            "early_stopping": {"patience": -1, "tolerance": 0.01},
        },
        "model": {
            "epoch": epochs,
            "learning_rate": 0.05,
            "num_bases": 2,
            "p_dropout": 0.0,
            "weight_decay": 0.0,
            "l1_lambda": 0.0,
            "l2_lambda": 0.0,
            "bias": False,
            "gates_lr": 0.01,
            "layers": [
                {"type": "mrgcn", "hidden_nodes": 32},
                {"type": "mrgcn"},
            ],
        },
    }
