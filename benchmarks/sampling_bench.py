"""Neighbour-sampled mini-batching: the shape/HBM bound, measured.

The round-5 ``[task] neighbor_fanout`` claim is capacity, not epoch speed:
on hub-heavy graphs a full L-hop expansion of even a small seed set pulls
in a constant fraction of the graph, so padded batch shapes (and with them
HBM residency per step) grow with GRAPH size; a per-hop fan-out cap makes
them grow with BATCH size only. This script builds a hub-heavy graph and
reports padded edge/node totals and build time for full vs capped
expansion at increasing graph scale.

Run: MRGCN_PLATFORM=cpu python benchmarks/sampling_bench.py

Measured (this box, 1-core CPU, round 5): batch=64, fanout=[15,10],
100 super-hubs of degree num_nodes/40::

        nodes     edges | full edges  full MB | capped edges capped MB
        20000    110000 |      66560      2.1 |         1280       0.1
        80000    440000 |     131328      6.3 |         1280       0.1
       320000   1760000 |     524544     25.2 |         1280       0.1

Full expansion of ONE 64-node batch touches ~30% of the graph's edges and
grows linearly with graph size; the capped batch is constant. At mmkg
scale (DMG ~14M statements) that is the difference between fitting in
HBM and not.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mrgcn_tpu.data import batching  # noqa: E402
from mrgcn_tpu.encodings.structure import GraphStructure, compute_norm  # noqa: E402

BATCH = 64
FANOUT = [15, 10]
NUM_RELS = 12


def hub_graph(num_nodes: int, num_hubs: int, hub_degree: int,
              base_degree: int = 3, hub_in_frac: float = 0.3,
              seed: int = 0) -> GraphStructure:
    """Random graph + ``num_hubs`` nodes of out-degree ``hub_degree`` that
    also receive ``hub_in_frac`` of all in-edges — the degree profile
    (bounded median, heavy head AND tail) of real KGs: rdf:type targets,
    country entities etc. are both heavily linked-to and richly described,
    so any BFS frontier hits a hub within a hop or two and full expansion
    then pulls in hub_degree edges per hub."""
    rng = np.random.default_rng(seed)
    hubs = rng.choice(num_nodes, num_hubs, replace=False)
    src = [np.repeat(hubs, hub_degree),
           rng.integers(0, num_nodes, num_nodes * base_degree)]
    src = np.concatenate(src).astype(np.int32)
    dst = rng.integers(0, num_nodes, len(src)).astype(np.int32)
    to_hub = rng.random(len(dst)) < hub_in_frac
    dst[to_hub] = rng.choice(hubs, int(to_hub.sum()))
    rel = rng.integers(0, NUM_RELS, len(src)).astype(np.int32)
    norm = compute_norm(src, rel, num_nodes, NUM_RELS)
    return GraphStructure(src=src, dst=dst, rel=rel, norm=norm,
                          num_nodes=num_nodes, num_relations=NUM_RELS)


def batch_stats(mb) -> dict:
    edges = sum(len(b.src) for b in mb.layer_edges)
    nodes = int(mb.layer_edges[0].num_in)
    # padded f32 hidden rows (16-dim input layer) + edge arrays (4 x i32/f32)
    mbytes = (nodes * 16 * 4 + edges * 16) / 1e6
    return {"padded_edges": edges, "outer_nodes": nodes, "mbytes": mbytes}


def main():
    rng = np.random.default_rng(1)
    print(f"{'nodes':>9} {'edges':>9} | {'full edges':>10} {'full MB':>8} "
          f"{'build s':>8} | {'capped edges':>12} {'capped MB':>9} "
          f"{'build s':>8}")
    # fixed super-hub set (rdf:type targets, countries, ...): hub COUNT does
    # not grow with graph size in real KGs, hub degree does
    for num_nodes in (20_000, 80_000, 320_000):
        g = hub_graph(num_nodes, num_hubs=100, hub_degree=num_nodes // 40)
        index = batching.EdgeIndex(g)
        seeds = rng.choice(num_nodes, BATCH, replace=False).astype(np.int32)

        t0 = time.perf_counter()
        full = batching.sample_minibatch(index, seeds, num_layers=2)
        t_full = time.perf_counter() - t0
        fs = batch_stats(full)

        t0 = time.perf_counter()
        capped = batching.sample_minibatch(
            index, seeds, num_layers=2, fanout=FANOUT,
            rng=np.random.default_rng(2))
        t_cap = time.perf_counter() - t0
        cs = batch_stats(capped)

        print(f"{num_nodes:>9} {len(g.src):>9} | {fs['padded_edges']:>10} "
              f"{fs['mbytes']:>8.1f} {t_full:>8.3f} | "
              f"{cs['padded_edges']:>12} {cs['mbytes']:>9.1f} "
              f"{t_cap:>8.3f}")


if __name__ == "__main__":
    main()
