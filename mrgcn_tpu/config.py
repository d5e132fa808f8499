"""TOML configuration loading and validation.

The config schema is the reference's (reference: configs/template.toml:1-175)
so existing dataset configs work unchanged. GPU-placement flags
(``gpu_acceleration``, ``gcn_gpu_acceleration``, ``lprank_gpu_acceleration``)
are accepted and ignored — on TPU the whole step is one jitted program
(see :mod:`mrgcn_tpu.parallel`).
"""

from __future__ import annotations

import logging
import tomllib
from typing import Dict

logger = logging.getLogger(__name__)

_MODEL_DEFAULTS = {
    "epoch": 50,
    "learning_rate": 0.01,
    "num_bases": 0,
    "p_dropout": 0.0,
    "weight_decay": 0.0,
    "l1_lambda": 0.0,
    "l2_lambda": 0.0,
    "bias": False,
    "gates_lr": 0.01,
}

_TASK_DEFAULTS = {
    "seed": -1,
    "batchsize": -1,
    "gcn_batchsize": -1,
    "test_batchsize": -1,
    "mrr_batchsize": -1,
    "eval_interval": 10,
    "neighbor_fanout": -1,        # cap per-node hop expansion in mini-batch
                                  # NC (int or per-hop list; <=0 = full) —
                                  # TPU-scale extension, no reference analogue
    "neighbor_fanout_rounds": 1,  # independent resamples cycled over epochs
    "negative_sampling_ratio": 0.2,   # LP: corrupted fraction of each
                                      # batch's real triples (the reference
                                      # hardcodes 1/5, lp.py:246-268; the
                                      # default is bit-identical to it)
    "negative_adversarial_temperature": 0.0,  # LP: > 0 weights negatives by
                                      # softmax(alpha * score) (RotatE-style
                                      # self-adversarial, stop-gradient);
                                      # 0 = reference-uniform
    "filter_ranks": True,
    "target_property": "",
    "target_property_inv": "",
}

_FEATURE_DEFAULTS = {
    "include": False,
    "share_weights": False,
    "embedding_dim": 16,   # guards the missing-embedding_dim defect in some
                           # shipped configs (reference: graph_features.py:129
                           # vs configs/dmg.toml:19-26)
    "p_dropout": 0.0,
    "p_noise": 0.0,
    "noise_multiplier": 0.0,
    "trim_outliers": False,
    "remove_outliers": False,
}


def load_config(path: str) -> Dict:
    with open(path, "rb") as f:
        config = tomllib.load(f)
    return apply_defaults(config)


def apply_defaults(config: Dict) -> Dict:
    model = config.setdefault("model", {})
    for k, v in _MODEL_DEFAULTS.items():
        model.setdefault(k, v)

    task = config.setdefault("task", {})
    for k, v in _TASK_DEFAULTS.items():
        task.setdefault(k, v)
    task.setdefault("early_stopping", {})
    task["early_stopping"].setdefault("patience", -1)
    task["early_stopping"].setdefault("tolerance", 0.01)

    graph = config.setdefault("graph", {})
    structural = graph.setdefault("structural", {})
    structural.setdefault("include_inverse_properties", True)
    structural.setdefault("exclude_properties", [])
    structural.setdefault("separate_literals", False)
    structural.setdefault("multiprocessing", False)

    for feature in graph.get("features", []):
        for k, v in _FEATURE_DEFAULTS.items():
            feature.setdefault(k, v)

    return config
