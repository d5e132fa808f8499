"""``run`` CLI: train + evaluate on a prepared dataset artifact.

Same flag surface as the reference trainer (reference: mrgcn/run.py:177-238):
``-c/-i/-o/-v/--dry_run/--load_checkpoint/--save_output/--save_checkpoint/
--test/--version``.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from time import time

from mrgcn_tpu import __version__
from mrgcn_tpu.config import load_config
from mrgcn_tpu.data import artifact as artifact_io
from mrgcn_tpu.data.tsv import TSV
from mrgcn_tpu.data.utils import is_readable, is_writable, set_seed
from mrgcn_tpu.tasks import link_prediction, node_classification
from mrgcn_tpu.tasks import utils as tutils
from mrgcn_tpu.utils.logging import init_logger

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    timestamp = int(time())

    parser = argparse.ArgumentParser(prog="MR-GCN (TPU)")
    parser.add_argument("-c", "--config", required=True,
                        help="Configuration file (toml)")
    parser.add_argument("-i", "--input", required=True,
                        help="Prepared input file (npz artifact, or a "
                             "reference-produced .tar dataset)")
    parser.add_argument("-o", "--output", default="/tmp/",
                        help="Output directory")
    parser.add_argument("-v", "--verbose", action="count", default=0,
                        help="Increase output verbosity")
    parser.add_argument("--dry_run", action="store_true",
                        help="Suppress writing output files to disk")
    parser.add_argument("--load_checkpoint", default=None,
                        help="Load model state from disk")
    parser.add_argument("--save_output", action="store_true",
                        help="Write final output to disk")
    parser.add_argument("--save_checkpoint", action="store_true",
                        help="Save model to disk")
    parser.add_argument("--test", action="store_true",
                        help="Report accuracy on the test set rather than "
                             "on the validation set")
    parser.add_argument("--version", action="version",
                        version=f"%(prog)s {__version__}")
    args = parser.parse_args(argv)

    from mrgcn_tpu.utils.platform import apply_platform_override
    apply_platform_override()

    assert is_readable(args.config)
    config = load_config(args.config)

    sep = "" if args.output.endswith(os.sep) else os.sep
    base = f"{args.output}{sep}{config['name']}{timestamp}_{os.getpid()}"
    assert is_writable(base)

    init_logger(base + ".log", args.dry_run, args.verbose)
    acc_writer = TSV(base + "_acc.tsv", "w", args.dry_run)

    logging.debug("Arguments:\n%s", "\n".join(
        f"\t{k}: {getattr(args, k)}" for k in vars(args)))

    seed = set_seed(config["task"]["seed"])
    test_split = "test" if args.test else "valid"

    features_cfg = config["graph"].get("features", [])
    featureless = not any(f["include"] for f in features_cfg)

    assert is_readable(args.input)
    logging.debug("Importing artifact")
    if args.input.endswith(".tar"):
        # reference-produced dataset (mkdataset.py of wxwilcke/mrgcn)
        from mrgcn_tpu.data.reference_tar import artifact_from_reference_tar
        artifact = artifact_from_reference_tar(args.input)
    else:
        artifact = artifact_io.load(args.input)

    from mrgcn_tpu.utils.profiling import profile_session

    task = config["task"]["type"]
    logging.info("Starting %s task", task)
    if task == "node classification":
        with profile_session():
            state, epoch, loss, acc, labels, targets = \
                node_classification.run(
                    artifact, config, acc_writer, featureless, test_split,
                    args.load_checkpoint, seed)
        print(f"loss {loss:.4f} / accuracy {acc:.4f}")

        if args.save_output:
            out_writer = TSV(base + "_out.tsv", "w")
            out_writer.writerow(["X", "Y_hat", "Y"])
            sample_map = artifact.sample_map
            class_map = artifact.class_map
            for i in range(len(labels)):
                out_writer.writerow([sample_map[test_split][i],
                                     class_map[int(labels[i])],
                                     class_map[int(targets[i])]])
    elif task == "link prediction":
        with profile_session():
            state, epoch, loss, mrr, hits, ranks = link_prediction.run(
                artifact, config, acc_writer, featureless, test_split,
                args.load_checkpoint, seed)
        results_str = (f"Performance on {test_split} set: "
                       f"MRR (raw) {mrr['raw']:.4f} - "
                       f"H@1 {hits['raw'][0]:.4f} / "
                       f"H@3 {hits['raw'][1]:.4f} / "
                       f"H@10 {hits['raw'][2]:.4f}")
        if config["task"]["filter_ranks"]:
            results_str += (f" | MRR (filtered) {mrr['flt']:.4f} - "
                            f"H@1 {hits['flt'][0]:.4f} / "
                            f"H@3 {hits['flt'][1]:.4f} / "
                            f"H@10 {hits['flt'][2]:.4f}")
        print(results_str)

        if args.save_output:
            rank_writer = TSV(base + "_ranks.tsv", "w")
            if config["task"]["filter_ranks"]:
                rank_writer.writerow(["raw", "filtered"])
                rank_writer.writerows(zip(ranks["raw"], ranks["flt"]))
            else:
                rank_writer.writerow(["raw"])
                for r in ranks["raw"]:
                    rank_writer.writerow([r])
    else:
        raise ValueError(f"unknown task type: {task}")

    if args.save_checkpoint:
        params, opt_state, batch_stats = state
        f_state = base + f"_model_state_{epoch}.npz"
        tutils.save_checkpoint(f_state, epoch, params, opt_state,
                               batch_stats, loss)
        print(f"[SAVE] Writing model state to {f_state}")

    logging.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
