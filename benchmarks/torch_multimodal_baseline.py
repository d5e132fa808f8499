"""Torch-CPU counterpart of bench_suite's multimodal NC epoch.

Mirrors benchmarks/bench_suite.py::bench_multimodal architecture-for-
architecture in PyTorch — the same encoder networks (1/2-layer MLPs, a
2-layer 128-dim transformer text encoder, the separable-conv image CNN),
learned scalar gates (init 0.1), gated scatter into the node feature
matrix, and the reference-math R-GCN (hstacked sparse adjacency, basis
decomposition; reference: mrgcn/layers/graph.py:62-102,
mrgcn/models/mrgcn.py:150-305). Written independently to measure the CPU
baseline epoch time for BENCH_EXTENDED.md.

Usage: python benchmarks/torch_multimodal_baseline.py [--steps 2]
Prints one JSON line: {"torch_cpu_multimodal_epoch_s": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.bench_suite import multimodal_workload  # noqa: E402


def build_model(torch, n, R, B, hidden, C, X_width):
    nn = torch.nn

    class TextEncoder(nn.Module):
        def __init__(self, out_dim, vocab=259, d=128, heads=4, layers=2,
                     max_len=512, pad_id=256):
            super().__init__()
            self.pad_id = pad_id
            self.embed = nn.Embedding(vocab, d)
            self.pos = nn.Parameter(torch.randn(max_len, d) * 0.02)
            self.blocks = nn.ModuleList()
            for _ in range(layers):
                self.blocks.append(nn.ModuleDict(dict(
                    ln1=nn.LayerNorm(d),
                    attn=nn.MultiheadAttention(d, heads, batch_first=True),
                    ln2=nn.LayerNorm(d),
                    fc1=nn.Linear(d, 4 * d),
                    fc2=nn.Linear(4 * d, d))))
            self.ln_f = nn.LayerNorm(d)
            self.pre_fc = nn.Linear(d, d)
            self.fc = nn.Linear(d, out_dim)

        def forward(self, tokens):
            pad_mask = tokens == self.pad_id
            x = self.embed(tokens) + self.pos[: tokens.shape[1]][None]
            for blk in self.blocks:
                y = blk["ln1"](x)
                y, _ = blk["attn"](y, y, y, key_padding_mask=pad_mask,
                                   need_weights=False)
                x = x + y
                y = blk["ln2"](x)
                x = x + blk["fc2"](torch.nn.functional.gelu(blk["fc1"](y)))
            pooled = self.ln_f(x)[:, 0]
            return self.fc(torch.relu(self.pre_fc(pooled)))

    class SepBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.dw = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin,
                                bias=False)
            self.bn1 = nn.BatchNorm2d(cin, momentum=0.1)
            self.pw = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout, momentum=0.1)

        def forward(self, x):
            x = torch.relu(self.bn1(self.dw(x)))
            return torch.relu(self.bn2(self.pw(x)))

    class ImageCNN(nn.Module):
        def __init__(self, out_dim, w=32):
            super().__init__()
            self.stem = nn.Conv2d(3, w, 3, 2, 1, bias=False)
            self.bn = nn.BatchNorm2d(w, momentum=0.1)
            chans = [(w, w * 2, 2), (w * 2, w * 2, 1), (w * 2, w * 4, 2),
                     (w * 4, w * 4, 1), (w * 4, w * 8, 2),
                     (w * 8, w * 8, 1), (w * 8, w * 16, 2)]
            self.blocks = nn.Sequential(
                *[SepBlock(a, b, s) for a, b, s in chans])
            self.pre_fc = nn.Linear(w * 16, w * 16)
            self.fc = nn.Linear(w * 16, out_dim)

        def forward(self, x):
            x = torch.relu(self.bn(self.stem(x)))
            x = self.blocks(x)
            x = x.mean(dim=(2, 3))
            return self.fc(torch.relu(self.pre_fc(x)))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_num = nn.Sequential(nn.Linear(1, 4), nn.ReLU())
            self.enc_year = nn.Sequential(nn.Linear(6, 5), nn.ReLU(),
                                          nn.Linear(5, 4), nn.ReLU())
            self.enc_text = TextEncoder(16)
            self.enc_img = ImageCNN(16)
            self.gates = nn.Parameter(torch.full((4,), 0.1))
            self.W_I = nn.Parameter(torch.empty(B * n, hidden))
            nn.init.xavier_uniform_(self.W_I)
            self.comp_I = nn.Parameter(torch.empty(R, B))
            nn.init.xavier_uniform_(self.comp_I)
            self.W_X = nn.Parameter(torch.empty(B, X_width, hidden))
            nn.init.xavier_uniform_(self.W_X)
            self.comp_X = nn.Parameter(torch.empty(R, B))
            nn.init.xavier_uniform_(self.comp_X)
            self.W_F = nn.Parameter(torch.empty(B, hidden, C))
            nn.init.xavier_uniform_(self.W_F)
            self.comp_F = nn.Parameter(torch.empty(R, B))
            nn.init.xavier_uniform_(self.comp_F)

        def forward(self, A, feats, idxs):
            X = torch.zeros(n, X_width)
            offs = [(self.enc_num, "num", 0, 4),
                    (self.enc_year, "year", 4, 8),
                    (self.enc_text, "text", 8, 24),
                    (self.enc_img, "img", 24, 40)]
            for gi, (enc, key, lo, hi) in enumerate(offs):
                emb = enc(feats[key]) * self.gates[gi]
                X = X.index_add(
                    0, idxs[key],
                    torch.nn.functional.pad(emb, (lo, X_width - hi)))
            Wi = torch.einsum(
                "rb,bij->rij", self.comp_I,
                self.W_I.view(B, n, hidden)).reshape(R * n, hidden)
            Wx = torch.einsum("rb,bij->rij", self.comp_X, self.W_X)
            XW = torch.einsum("ij,bjk->bik", X, Wx).reshape(R * n, hidden)
            H = torch.relu(torch.mm(A, Wi) + torch.mm(A, XW))
            Wf = torch.einsum("rb,bij->rij", self.comp_F, self.W_F)
            FW = torch.einsum("ij,bjk->bik", H, Wf).reshape(R * n, C)
            return torch.mm(A, FW)

    return Model()


def main():
    import torch
    torch.manual_seed(0)

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--smoke", action="store_true",
                        help="1/100-scale shapes for a correctness check")
    args = parser.parse_args()

    w = multimodal_workload()
    if args.smoke:
        rng = w["rng"]
        n, E, R, B = 600, 4_000, 11, 8
        w = dict(n=n, E=E, R=R, B=B,
                 src=rng.integers(0, n, E).astype(np.int32),
                 dst=rng.integers(0, n, E).astype(np.int32),
                 rel=rng.integers(0, R, E).astype(np.int32),
                 norm=rng.random(E).astype(np.float32),
                 feats={"num": rng.random((200, 1)).astype(np.float32),
                        "year": rng.random((100, 6)).astype(np.float32),
                        "text": rng.integers(0, 259, (80, 128))
                        .astype(np.int32),
                        "img": rng.integers(0, 255, (20, 3, 64, 64))
                        .astype(np.uint8)},
                 rng=rng)
    n, E, R, B = w["n"], w["E"], w["R"], w["B"]
    hidden, C, X_width = 16, 14, 40
    rng = w["rng"]

    cols = torch.as_tensor(w["rel"].astype(np.int64) * n
                           + w["dst"].astype(np.int64))
    rows = torch.as_tensor(w["src"].astype(np.int64))
    A = torch.sparse_coo_tensor(torch.stack([rows, cols]),
                                torch.as_tensor(w["norm"]),
                                size=(n, R * n)).coalesce()

    feats = {
        "num": torch.as_tensor(w["feats"]["num"]),
        "year": torch.as_tensor(w["feats"]["year"]),
        "text": torch.as_tensor(w["feats"]["text"].astype(np.int64)),
        "img": torch.as_tensor(
            w["feats"]["img"].astype(np.float32) / 255.0),
    }
    idxs = {k: torch.as_tensor(rng.choice(n, len(v), replace=False)
                               .astype(np.int64))
            for k, v in feats.items()}

    model = build_model(torch, n, R, B, hidden, C, X_width)
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    criterion = torch.nn.CrossEntropyLoss()
    n_lab = min(10_000, n // 2)
    li = torch.as_tensor(rng.choice(n, n_lab, replace=False)
                         .astype(np.int64))
    lc = torch.as_tensor(rng.integers(0, C, n_lab).astype(np.int64))

    def epoch():
        opt.zero_grad()
        out = model(A, feats, idxs)
        loss = criterion(out[li], lc)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return float(loss)

    epoch()  # warmup
    times = []
    for _ in range(args.steps):
        t0 = time.time()
        epoch()
        times.append(time.time() - t0)
    print(json.dumps({"torch_cpu_multimodal_epoch_s":
                      float(np.mean(times))}))


if __name__ == "__main__":
    main()
