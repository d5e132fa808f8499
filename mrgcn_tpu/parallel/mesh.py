"""Device mesh + sharding rules for multi-chip training.

The reference's distribution story is manual per-module CPU/GPU placement
with explicit ``.to(device)`` hops (reference: mrgcn/models/mrgcn.py:136-180,
mrgcn/data/batch.py:114-132). The TPU-native equivalent is one jitted program
over a ``jax.sharding.Mesh``; GSPMD inserts the collectives.

Sharding layout for full-graph R-GCN training:

  * **edge arrays** (src/dst/rel/norm): sharded along the ``data`` axis — the
    segment-sum becomes per-shard partial aggregation + ``psum`` over ICI;
  * **per-modality feature rows**: sharded along ``data`` — encoders are
    embarrassingly parallel over rows;
  * **parameters**: replicated by default; the basis dimension of the R-GCN
    weights (``weight_f (S, in, out)``, ``weight_i (S, n, out)``) shards over
    the ``model`` axis when divisible, which keeps the big identity weight
    from being replicated on every chip;
  * **node embeddings / logits**: replicated (every chip needs every node's
    embedding for ranking / the next layer's gathers).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrgcn_tpu.models.rgcn import EdgeBlock

logger = logging.getLogger(__name__)


def mesh_from_config(config: Dict) -> Optional[Mesh]:
    """Build the training mesh when requested, else None (single device).

    Spec sources (first match wins): the ``MRGCN_MESH`` environment
    variable, then ``[task] mesh`` in the TOML config. Formats:
    ``"auto"`` (all devices, data-parallel), ``"8"`` (8 devices,
    data-parallel), ``"4x2"`` (data=4, model=2).
    """
    import os
    spec = os.environ.get("MRGCN_MESH") or config.get("task", {}).get(
        "mesh", "")
    spec = str(spec).strip().lower()
    if not spec or spec in ("0", "1", "none", "off"):
        return None
    if spec == "auto":
        return make_mesh()
    if "x" in spec:
        data, model = (int(p) for p in spec.split("x", 1))
        return make_mesh(data * model, model_axis=model)
    return make_mesh(int(spec))


def _pad_1d(x, target: int, value):
    import jax.numpy as jnp
    pad = target - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,), value, dtype=x.dtype)])


def pad_edges_for_mesh(edges: EdgeBlock, data_size: int) -> EdgeBlock:
    """Pad edge arrays (and whole relation groups) so every edge-aligned
    array divides evenly over the data axis. Padding carries ``norm == 0``
    and scatters out of range."""
    E = edges.src.shape[0]
    target = -(-E // data_size) * data_size
    kw = dict(src=_pad_1d(edges.src, target, edges.num_out),
              dst=_pad_1d(edges.dst, target, 0),
              rel=_pad_1d(edges.rel, target, 0),
              norm=_pad_1d(edges.norm, target, 0.0),
              num_out=edges.num_out, num_in=edges.num_in,
              dst_global=(None if edges.dst_global is None else
                          _pad_1d(edges.dst_global, target, 0)),
              group_size=edges.group_size, plans=None)
    if edges.grouped:
        G = edges.group_rel.shape[0]
        Gt = -(-G // data_size) * data_size
        gs = edges.group_size
        kw.update(grp_src=_pad_1d(edges.grp_src, Gt * gs, edges.num_out),
                  grp_dst=_pad_1d(edges.grp_dst, Gt * gs, 0),
                  grp_norm=_pad_1d(edges.grp_norm, Gt * gs, 0.0),
                  group_rel=_pad_1d(edges.group_rel, Gt, 0))
    return EdgeBlock(**kw)


def shard_inputs(mesh: Mesh, inputs):
    """Shard a :class:`mrgcn_tpu.tasks.common.RunInputs` for mesh training:
    edge arrays and feature rows over ``data``. The sorted-stream gather
    plans are rebuilt as per-shard stacked streams (relational.
    shard_layer_plans) so the fast engine keeps running inside shard_map
    on every chip, with a psum over the data axis combining the partial
    aggregates."""
    from dataclasses import replace
    edges = pad_edges_for_mesh(inputs.edges, mesh.shape["data"])
    plans = shard_plans(mesh, inputs)
    edges = shard_edges(mesh, edges, plans=plans)
    features = shard_features(mesh, inputs.features)
    return replace(inputs, edges=edges, features=features)


def shard_plans(mesh: Mesh, inputs) -> Optional[Dict]:
    """Rebuild the input's layer plans as per-device stacked streams,
    placed with the leading shard axis on ``data``."""
    import jax.numpy as jnp
    from mrgcn_tpu.ops import relational as rl
    old = inputs.edges.plans
    st = getattr(inputs, "structure", None)
    if not old or st is None:
        return None
    data_size = mesh.shape["data"]
    spec = NamedSharding(mesh, P("data"))
    out = {}
    for key, pl in old.items():
        kind = pl.kind
        sharded = rl.shard_layer_plans(
            st.src, st.dst, st.rel, st.norm, st.num_nodes,
            pl.k_in, pl.k_out, data_size, kind=kind)
        out[key] = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), spec), sharded)
    return out


def shard_restricted_block(mesh: Mesh, block: EdgeBlock) -> EdgeBlock:
    """Place one frontier-restricted EdgeBlock
    (tasks/common.restricted_layer_edges) on the mesh: pad + shard its
    edge/grouped arrays over ``data`` and device_put its (already
    per-shard stacked) plans with the leading shard axis on ``data`` —
    the multi-chip twin of shard_inputs for the restricted chain."""
    import jax.numpy as jnp
    plans = None
    if block.plans:
        spec = NamedSharding(mesh, P("data"))
        plans = {k: jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), spec), pl)
            for k, pl in block.plans.items()}
    padded = pad_edges_for_mesh(block, mesh.shape["data"])
    return shard_edges(mesh, padded, plans=plans)


def make_mesh(n_devices: Optional[int] = None,
              model_axis: int = 1) -> Mesh:
    """1-or-2-D mesh over the first ``n_devices`` devices:
    ``(data, model)`` with ``model_axis`` chips on the model dimension."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n])
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model axis "
                         f"{model_axis}")
    return Mesh(devices.reshape(n // model_axis, model_axis),
                ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def edge_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_edges(mesh: Mesh, edges: EdgeBlock,
                plans: Optional[Dict] = None) -> EdgeBlock:
    """Place edge arrays sharded over the data axis. Edge counts must be
    divisible by the data-axis size (use
    :func:`mrgcn_tpu.encodings.structure.pad_edges`)."""
    spec = edge_sharding(mesh)
    put = lambda x: jax.device_put(x, spec)  # noqa: E731

    # grouped layout: shard edge-aligned arrays when the group count splits
    # evenly over the data axis (group boundaries must align with shard
    # boundaries); otherwise replicate — the grouped MXU path stays active
    # either way
    grp = {"grp_src": None, "grp_dst": None, "grp_norm": None,
           "group_rel": None}
    if edges.grouped:
        data_size = mesh.shape["data"]
        if edges.group_rel.shape[0] % data_size == 0:
            gput = put
        else:
            rep = replicated(mesh)
            gput = lambda x: jax.device_put(x, rep)  # noqa: E731
        grp = {"grp_src": gput(edges.grp_src),
               "grp_dst": gput(edges.grp_dst),
               "grp_norm": gput(edges.grp_norm),
               "group_rel": gput(edges.group_rel)}

    return EdgeBlock(src=put(edges.src), dst=put(edges.dst),
                     rel=put(edges.rel), norm=put(edges.norm),
                     num_out=edges.num_out, num_in=edges.num_in,
                     dst_global=(None if edges.dst_global is None
                                 else put(edges.dst_global)),
                     group_size=edges.group_size,
                     plans=plans, mesh=(mesh if plans else None), **grp)


def shard_features(mesh: Mesh, features: Dict) -> Dict:
    """Shard per-modality feature rows over the data axis where divisible;
    replicate otherwise (feature row counts are data-dependent)."""
    data_size = mesh.shape["data"]
    out = {}
    for name, entry in features.items():
        data, node_idx, rest = entry[0], entry[1], entry[2:]
        if data.shape[0] % data_size == 0 and data.shape[0] > 0:
            spec = NamedSharding(mesh, P("data"))
        else:
            spec = replicated(mesh)
        # the precomputed inverse map (if present) is node-dim sized, not
        # feature-row sized — replicate it
        out[name] = (jax.device_put(data, spec),
                     jax.device_put(node_idx, spec),
                     *(jax.device_put(r, replicated(mesh)) for r in rest))
    return out


def param_shardings(mesh: Mesh, params):
    """Replicate everything except the basis dimension of the R-GCN weights,
    which shards over the ``model`` axis when divisible."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("weight_i", "weight_i_packed", "weight_f") \
                and model_size > 1 and leaf.shape[0] % model_size == 0:
            return NamedSharding(mesh, P("model"))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
