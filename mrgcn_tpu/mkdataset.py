"""``mkdataset`` CLI: offline ETL — RDF graphs -> dataset artifact (.npz).

Same flag surface and two-stage contract as the reference
(reference: mrgcn/mkdataset.py:18-126): node classification reads three
target-triple splits plus a context graph (stripping inverse-target edges);
link prediction merges the three splits into one graph for structure/features
and stores each split as an ``(n, 3)`` index array.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from time import time

from mrgcn_tpu.config import load_config
from mrgcn_tpu.data import artifact
from mrgcn_tpu.data.kg import KnowledgeGraph
from mrgcn_tpu.data.utils import (is_readable, is_writable, strip_graph,
                                  triples_to_indices)
from mrgcn_tpu.encodings import structure
from mrgcn_tpu.tasks import build as dataset_build
from mrgcn_tpu.utils.logging import init_logger

logger = logging.getLogger(__name__)


def build(config: dict):
    task = config["task"]["type"]
    logging.info("Task set to %s", task)
    logging.info("Generating data structures")

    features_cfg = config["graph"].get("features", [])
    featureless = not any(f["include"] for f in features_cfg)

    data = None
    sample_map = None
    class_map = None
    if task == "node classification":
        triples = {}
        for split in ("train", "valid", "test"):
            with KnowledgeGraph(config["graph"][split]) as kg_split:
                triples[split] = frozenset(
                    kg_split.triples(separate_literals=False))

        with KnowledgeGraph(config["graph"]["context"]) as kg:
            strip_graph(kg, config)
            A, nodes_map, _ = structure.generate(kg, config)
            F, Y, sample_map, class_map = dataset_build.build_dataset_nc(
                kg, nodes_map, triples, config, featureless)
    elif task == "link prediction":
        with KnowledgeGraph([config["graph"]["train"],
                             config["graph"]["valid"],
                             config["graph"]["test"]]) as kg:
            A, nodes_map, edges_map = structure.generate(kg, config)
            F = dataset_build.build_dataset_lp(kg, nodes_map, config,
                                               featureless)
            Y = {}

            separate_literals = \
                config["graph"]["structural"]["separate_literals"]
            data = {}
            for split in ("train", "valid", "test"):
                with KnowledgeGraph(config["graph"][split]) as kg_split:
                    data[split] = triples_to_indices(
                        kg_split, nodes_map, edges_map, separate_literals)
    else:
        raise ValueError(f"unknown task type: {task}")

    return A, F, Y, data, sample_map, class_map


def main(argv=None) -> int:
    timestamp = int(time())

    parser = argparse.ArgumentParser(prog="mrgcn-mkdataset")
    parser.add_argument("-c", "--config", required=True,
                        help="Configuration file (toml)")
    parser.add_argument("-o", "--output", default="/tmp/",
                        help="Output directory")
    parser.add_argument("-v", "--verbose", action="count", default=0,
                        help="Increase output verbosity")
    parser.add_argument("--dry_run", action="store_true",
                        help="Suppress writing output files to disk")
    args = parser.parse_args(argv)

    assert is_readable(args.config)
    config = load_config(args.config)

    sep = "" if args.output.endswith(os.sep) else os.sep
    base = f"{args.output}{sep}{config['name']}{timestamp}"
    assert is_writable(base)

    init_logger(base + ".log", args.dry_run, args.verbose)
    logging.debug("Arguments:\n%s", "\n".join(
        f"\t{k}: {getattr(args, k)}" for k in vars(args)))

    A, F, Y, data, sample_map, class_map = build(config)

    if not args.dry_run:
        path = base + ".npz"
        artifact.save(path, A, F, Y=Y, data=data, sample_map=sample_map,
                      class_map=class_map)
        logging.info("Dataset saved as %s", path)
        print(path)

    logging.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
