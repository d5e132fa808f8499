"""Generate the round-3 'decisive' parity datasets + configs.

The bundled smoke splits are too small to resolve parity (LP: 36 test
facts — the reference's own 5-seed mean moves ~0.03 MRR between harness
launches). This writes larger synthetic datasets under
``benchmarks/parity/big/`` (not committed — regenerate at will):

  * NC: 2500 entities, class signal in FIVE modalities the reference can
    run with zero downloads (numeric, boolean, date, dateTime, gYear);
    ~5.5k graph nodes, 500 test instances.
  * LP: 3500 entities, ~10.5k structured triples, ~1050 test facts
    (29x the smoke split -> ~5x smaller noise floor).

Run:  python benchmarks/parity/gen_big.py
Then: python benchmarks/parity/run_parity.py --big --seeds 10
"""

from __future__ import annotations

import os
import random
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from tests.prestage import _literal_for  # noqa: E402
from tests.synth import EX, _fmt, _write_nt, make_lp_dataset  # noqa: E402

NC_DATATYPES = ["xsd.numeric", "xsd.boolean", "xsd.date", "xsd.dateTime",
                "xsd.gYear"]


def make_big_nc(dirpath: str, num_entities: int = 2500, seed: int = 42):
    rng = random.Random(seed)
    os.makedirs(dirpath, exist_ok=True)
    context, targets = [], []
    for i in range(num_entities):
        e = f"{EX}e{i}"
        cls = i % 2
        targets.append(
            f"{_fmt(e)} {_fmt(EX + 'hasClass')} {_fmt(EX + f'c{cls}')}")
        for dt in NC_DATATYPES:
            prop = EX + "has" + dt.replace(".", "_")
            # 25% label noise per literal keeps test accuracy off the
            # 1.0 ceiling, so the parity comparison stays discriminative
            eff = cls if rng.random() > 0.25 else 1 - cls
            context.append(
                f"{_fmt(e)} {_fmt(prop)} {_literal_for(dt, eff, rng)}")
        for _ in range(2):
            j = rng.randrange(num_entities)
            context.append(f"{_fmt(e)} {_fmt(EX + 'linksTo')} "
                           f"{_fmt(EX + f'e{j}')}")

    rng.shuffle(targets)
    n_tr, n_va = int(0.6 * num_entities), int(0.2 * num_entities)
    paths = {"context": os.path.join(dirpath, "context.nt.gz")}
    _write_nt(paths["context"], context)
    for split, lines in (("train", targets[:n_tr]),
                         ("valid", targets[n_tr:n_tr + n_va]),
                         ("test", targets[n_tr + n_va:])):
        paths[split] = os.path.join(dirpath, f"{split}.nt.gz")
        _write_nt(paths[split], lines)
    return paths


def nc_config_toml(paths) -> str:
    feats = "\n".join(f"""[[graph.features]]
datatype = '{dt}'
include = true
share_weights = true
embedding_dim = 4
p_dropout = 0.0
p_noise = 0.0
noise_multiplier = 0.0
gpu_acceleration = false
""" for dt in NC_DATATYPES)
    return f"""name = "PARITYBIG-NC"

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

{feats}
[task]
type = "node classification"
target_property = 'http://example.org/hasClass'
target_property_inv = ''
seed = 1
batchsize = -1
gcn_gpu_acceleration = false
early_stopping.patience = -1
early_stopping.tolerance = 0.01

[model]
epoch = 40
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


def lp_config_toml(paths) -> str:
    return f"""name = "PARITYBIG-LP"

[graph]
train = "{paths['train']}"
valid = "{paths['valid']}"
test = "{paths['test']}"

[graph.structural]
include_inverse_properties = true
exclude_properties = []
separate_literals = false
multiprocessing = false

[task]
type = "link prediction"
target_property = ''
target_property_inv = ''
seed = 1
gcn_batchsize = -1
test_batchsize = -1
mrr_batchsize = 50
eval_interval = 100
filter_ranks = true
lprank_gpu_acceleration = false
gcn_gpu_acceleration = false
early_stopping.patience = -1
early_stopping.tolerance = 0.01

[model]
epoch = 100
learning_rate = 0.05
num_bases = 2
p_dropout = 0.0
weight_decay = 0.0
l1_lambda = 0.0
l2_lambda = 0.0
bias = false
gates_lr = 0.01

[[model.layers]]
type = 'mrgcn'
hidden_nodes = 32

[[model.layers]]
type = 'mrgcn'
"""


def main():
    base = os.path.join(HERE, "big")
    nc_paths = make_big_nc(os.path.join(base, "nc"))
    with open(os.path.join(base, "nc_config.toml"), "w") as f:
        f.write(nc_config_toml(nc_paths))
    lp_paths = make_lp_dataset(os.path.join(base, "lp"),
                               num_entities=3500)
    with open(os.path.join(base, "lp_config.toml"), "w") as f:
        f.write(lp_config_toml(lp_paths))
    print(base)


if __name__ == "__main__":
    sys.exit(main() or 0)
