"""Relational Graph Convolutional Network (R-GCN) in flax.

TPU re-design of reference: mrgcn/layers/graph.py + mrgcn/models/rgcn.py.
The layer math is identical — ``AXW = A[I F]W = A I W_I + A F W_F`` with
basis decomposition — but executed over the relation-partitioned COO edge
list via :mod:`mrgcn_tpu.ops.rspmm` instead of a sparse matmul against the
hstacked adjacency.

Node dropout multiplies layer outputs by a dropped-and-rescaled ones vector,
exactly the reference's trick (reference: models/rgcn.py:78-84).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from mrgcn_tpu.models import init as tinit
from mrgcn_tpu.ops import rspmm
from mrgcn_tpu.ops.pallas_gather import interp_mode as _interp


@struct.dataclass
class EdgeBlock:
    """Static-shape edge arrays for one propagation step.

    ``src`` indexes output rows, ``dst`` indexes input (H) rows, ``rel`` is
    the relation id, ``norm`` the precomputed D^-1 weight (0 on padding
    edges). ``dst_global`` indexes the global node space for the identity
    weight gather; equals ``dst`` in full-batch mode. Row counts are pytree
    metadata, so they stay static under ``jit``.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    rel: jnp.ndarray
    norm: jnp.ndarray
    num_out: int = struct.field(pytree_node=False)
    num_in: Optional[int] = struct.field(pytree_node=False, default=None)
    dst_global: Optional[jnp.ndarray] = None
    # relation-grouped layout (see structure.group_by_relation) — the fast
    # MXU path for dense-feature layers; None falls back to the fused path
    grp_src: Optional[jnp.ndarray] = None
    grp_dst: Optional[jnp.ndarray] = None
    grp_norm: Optional[jnp.ndarray] = None
    group_rel: Optional[jnp.ndarray] = None
    group_size: Optional[int] = struct.field(pytree_node=False, default=None)
    # sorted-stream layer plans keyed by "kin:kout" (see ops/relational.py)
    # — the Pallas fast path; built for full-batch edges only
    # (dst == dst_global), dict keys are static pytree structure.
    # Under a mesh the plans are per-shard stacked (LayerPlans.num_shards
    # > 1) and ``mesh`` carries the jax.sharding.Mesh the shard_map
    # wrappers run over (static metadata — meshes are hashable).
    plans: Optional[dict] = None
    mesh: Optional[object] = struct.field(pytree_node=False, default=None)

    def plan_for(self, in_width: int, out_width: int,
                 identity: bool = False):
        """LayerPlans matching a layer shape (packing factors are functions
        of the widths alone, so layers of equal widths share plans).
        Identity (featureless) layers use separate plans — their streams
        skip the relation-constant slab splits dense layers want
        (see ops.relational.build_layer_plans)."""
        if not self.plans or self.dst_global is not None:
            return None
        k_in = rspmm.packing_factor(in_width)
        k_out = rspmm.packing_factor(out_width)
        if identity:
            plan = self.plans.get(f"{k_in}:{k_out}:id") \
                or self.plans.get(f"{k_in}:{k_out}:idb") \
                or self.plans.get(f"{k_in}:{k_out}")
            return plan
        return self.plans.get(f"{k_in}:{k_out}")

    @property
    def identity_dst(self) -> jnp.ndarray:
        return self.dst if self.dst_global is None else self.dst_global

    @property
    def grouped(self) -> bool:
        return self.group_rel is not None


def _fit_rows(packed, plan):
    """Slice or pad a (S, rows, lanes) packed weight to the plan's padded
    row count. Parameters are stored ALREADY padded to the engine's
    table-block multiples (rspmm.packed_identity_shape) — an in-program
    ``jnp.pad`` of the full tensor measured at >1 s/step on a v5e; the
    slice/pad here only triggers for tests running smaller plan row
    blocks, and the sliced-away padding rows are all zero and never
    addressed."""
    n_rows = packed.shape[1]
    if n_rows > plan.n_in_rows:
        return packed[:, :plan.n_in_rows, :]
    if n_rows < plan.n_in_rows:
        return jnp.pad(packed, ((0, 0), (0, plan.n_in_rows - n_rows),
                                (0, 0)))
    return packed


def _identity_planned(packed, comp, plan, out_dim):
    """Featureless input layer on the sorted-stream engine: compose the
    relation-major packed table (one matmul) and hand it to the layer op."""
    from mrgcn_tpu.ops import relational as rl
    lw = packed.shape[2]
    pk = _fit_rows(packed, plan)
    if comp is not None:
        import os
        if os.environ.get("MRGCN_FUSED_COMPOSE_BWD", "0") != "0":
            # single-pass backward over the cotangent table: d_comp and
            # d_packed come from ONE read of d_t
            # (ops/relational.featureless_composed)
            return rl.featureless_composed(comp, pk, plan, out_dim,
                                           interpret=_interp())
        # relation-major 3-D compose with a custom vjp: keeps the
        # (R*rows, lanes) view a free bitcast and the dot exact f32 —
        # train-step cost 42.2 -> 29.0 ms at bench scale
        # (see rspmm.compose_packed / benchmarks/micro_compose_vjp.py)
        flat = rspmm.compose_packed(comp, pk)
    else:
        flat = pk
    return rl.featureless_aggregate(flat.reshape(-1, lw), plan, out_dim,
                                    interpret=_interp())


def _shard_specs(n: int):
    from jax.sharding import PartitionSpec as P
    return tuple(P() for _ in range(n)) + (P("data"),), P()


def _planned_sharded(layer_fn, packed, comp, plan, out_dim, mesh):
    """Featureless planned layer under a device mesh: every chip runs the
    single-chip engine (``layer_fn``) on its shard of the edge streams
    (keeping the Pallas fast path alive under GSPMD — round-2 dropped to
    the slow XLA paths here) and the partial aggregates psum over ICI."""
    from mrgcn_tpu.ops import relational as rl

    def local(pk, c, pl):
        out = layer_fn(pk, c, rl.unstack_plan(pl), out_dim)
        return jax.lax.psum(out, "data")

    # check_vma=False: the engine's custom_vjp kernels block variance
    # inference through the transpose; grads are pinned numerically to the
    # single-device engine in tests/test_sharded_plans.py
    in_specs, out_spec = _shard_specs(2)
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec,
                         check_vma=False)(packed, comp, plan)


def _identity_planned_sharded(packed, comp, plan, out_dim, mesh):
    return _planned_sharded(_identity_planned, packed, comp, plan,
                            out_dim, mesh)


def _basis_planned(packed, comp, plan, out_dim):
    """Featureless basis-stream layer (ops/relational.featureless_basis):
    the composed table would not fit HBM, so compose happens per edge.
    ``MRGCN_WIDE_BASIS=1`` runs the combined-plane variant (one wide line
    per edge instead of B separate gathers/scatters)."""
    import os

    from mrgcn_tpu.ops import relational as rl
    if os.environ.get("MRGCN_WIDE_BASIS", "0") != "0":
        return rl.featureless_basis_wide(comp, _fit_rows(packed, plan),
                                         plan, out_dim,
                                         interpret=_interp())
    return rl.featureless_basis(comp, _fit_rows(packed, plan), plan,
                                out_dim, interpret=_interp())


def _basis_planned_sharded(packed, comp, plan, out_dim, mesh):
    return _planned_sharded(_basis_planned, packed, comp, plan, out_dim,
                            mesh)


def _dense_planned_sharded(H, W, plan, in_dim, out_dim, mesh):
    from mrgcn_tpu.ops import relational as rl

    def local(h, w, pl):
        out = rl.dense_aggregate(h, w, rl.unstack_plan(pl), in_dim,
                                 out_dim, interpret=_interp())
        return jax.lax.psum(out, "data")

    in_specs, out_spec = _shard_specs(2)
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec, check_vma=False)(H, W, plan)


def _dense_basis_sharded(H, basis, comp, plan, in_dim, out_dim, mesh):
    from mrgcn_tpu.ops import relational as rl

    def local(h, ba, c, pl):
        out = rl.dense_basis(h, ba, c, rl.unstack_plan(pl), in_dim,
                             out_dim, interpret=_interp())
        return jax.lax.psum(out, "data")

    in_specs, out_spec = _shard_specs(3)
    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec,
                         check_vma=False)(H, basis, comp, plan)


class RGCNLayer(nn.Module):
    """One graph convolution (reference: layers/graph.py:8-116).

    The input layer holds a separate identity weight ``W_I`` of shape
    ``(S, num_nodes, out)``; every layer with features holds
    ``W_F (S, in, out)``; with ``num_bases > 0``, per-relation mixing
    coefficients ``comp (R, B)`` compose the effective weights.
    """

    out_dim: int
    num_relations: int
    num_nodes: int
    num_bases: int = 0
    input_layer: bool = False
    featureless: bool = False
    use_bias: bool = False
    shared_bases_weights: bool = False

    @nn.compact
    def __call__(self, H: Optional[jnp.ndarray],
                 edges: EdgeBlock) -> jnp.ndarray:
        S = self.num_bases if self.num_bases > 0 else self.num_relations
        bases = self.num_bases > 0

        comp_i = comp_f = None
        if bases and self.input_layer:
            comp_i = self.param("comp_i", tinit.xavier_uniform(),
                                (self.num_relations, self.num_bases))
        if bases and not self.featureless:
            if self.shared_bases_weights and comp_i is not None:
                comp_f = comp_i  # (reference: graph.py:42-44)
            else:
                comp_f = self.param("comp_f", tinit.xavier_uniform(),
                                    (self.num_relations, self.num_bases))

        out = 0.0
        if self.input_layer:
            # fans computed over the flattened (S*n, out) matrix, matching
            # the reference's 2-D xavier (reference: graph.py:51, 104-112).
            # For narrow outputs the weight is stored row-packed
            # (k rows per 128-lane row) — see rspmm.packed_identity_shape —
            # cutting HBM residency, optimizer traffic and gather bytes by
            # 128/out.
            fan_shape = (S * self.num_nodes, self.out_dim)
            shape, k = rspmm.packed_identity_shape(S, self.num_nodes,
                                                   self.out_dim)
            plan_i = edges.plan_for(self.out_dim, self.out_dim,
                                    identity=True)
            use_basis = False
            if plan_i is not None and comp_i is not None:
                # the planned featureless op gathers from the COMPOSED
                # (R * rows, lanes) table; for wide layouts (e.g. LP
                # hidden=200, R~500) that table would not fit HBM — run
                # the basis-stream op (per-edge compose, B gathers) when
                # the plans carry its dst-sorted bwd_h stream, else fall
                # back to the fused-basis XLA path
                from mrgcn_tpu.ops import relational as rl
                table_elems = rl.composed_table_elems(
                    self.num_relations, self.num_nodes, self.out_dim,
                    n_in_rows=plan_i.n_in_rows)
                if table_elems > rl.COMPOSED_TABLE_MAX_ELEMS:
                    if plan_i.kind == "identity_basis" \
                            and 0 < self.num_bases <= rl.MAX_BASIS_STREAMS:
                        use_basis = True
                    else:
                        plan_i = None
            weight_i = self.param(
                "weight_i_packed" if k > 1 else "weight_i",
                tinit.packed_xavier_uniform(fan_shape, self.num_nodes,
                                            self.out_dim, k),
                shape)
            if plan_i is not None and plan_i.num_shards > 1 \
                    and edges.mesh is not None:
                fn = _basis_planned_sharded if use_basis \
                    else _identity_planned_sharded
                out = fn(weight_i, comp_i, plan_i, self.out_dim,
                         edges.mesh)
            elif use_basis:
                out = _basis_planned(weight_i, comp_i, plan_i,
                                     self.out_dim)
            elif plan_i is not None:
                out = _identity_planned(weight_i, comp_i, plan_i,
                                        self.out_dim)
            elif k > 1:
                out = rspmm.gather_aggregate_packed(
                    weight_i, edges.src, edges.identity_dst, edges.rel,
                    edges.norm, edges.num_out, self.out_dim, k,
                    comp=comp_i)
            else:
                # unplanned wide path expects logical (S, n, out) rows
                out = rspmm.gather_aggregate(
                    weight_i[:, :self.num_nodes, :self.out_dim],
                    edges.src, edges.identity_dst, edges.rel,
                    edges.norm, edges.num_out, comp=comp_i)

            if self.featureless:
                if self.use_bias:
                    out = out + self.param("bias", nn.initializers.zeros,
                                           (self.out_dim,))
                return out

        weight_f = self.param("weight_f", tinit.xavier_uniform(),
                              (S, H.shape[-1], self.out_dim))
        plan_f = edges.plan_for(H.shape[-1], self.out_dim)
        dense_basis_plan = None
        if plan_f is not None and not plan_f.fwd.rel_const \
                and H.shape[-1] * self.out_dim > 4096:
            # without relation-constant slabs the plan path applies weights
            # via a per-edge (E, in, out) gather + einsum; for wide layers
            # (LP's 200x200) XLA cannot keep that fused and the compile
            # OOMs on a ~45 GB remat buffer. With basis decomposition the
            # stream engine still applies: dense_basis rewrites the layer
            # through the tiny (n, B*out) per-basis projections, replacing
            # the relation-grouped fallback whose dW backward materialises
            # a (G, in, out) buffer (measured 25 ms-class at FB15k-237
            # scale vs a ~4 ms roofline — docs/session_r3.md
            # FINAL_GROUPED_DW). MRGCN_DENSE_BASIS=0 reverts to grouped.
            import os

            from mrgcn_tpu.ops import relational as rl
            # default grouped: the hybrid's hand-written grouped backward
            # measured 90.0 ms fwd+bwd vs autodiff-grouped 33.6 (v5e,
            # tpu_batch_r4c FINAL_HYBRID_AB — LP epoch 134 vs 94.7);
            # r4d decomposes the pathology. "hybrid"/"1" stay as the
            # measured variants.
            mode = os.environ.get("MRGCN_DENSE_BASIS", "0")
            if (comp_f is not None and plan_f.k_in == 1
                    and plan_f.kind == "dense"
                    and 0 < self.num_bases <= rl.MAX_BASIS_STREAMS
                    and mode != "0"
                    and (mode != "hybrid" or edges.grouped)):
                dense_basis_plan = plan_f
            plan_f = None
        agg = None
        if dense_basis_plan is not None:
            from mrgcn_tpu.ops import relational as rl
            if dense_basis_plan.num_shards > 1 and edges.mesh is not None:
                # sharded path: the stream op per shard (the grouped-bwd
                # hybrid needs the grouped arrays aligned with the shard
                # deal, which shard_inputs does not guarantee)
                agg = _dense_basis_sharded(H, weight_f, comp_f,
                                           dense_basis_plan, H.shape[-1],
                                           self.out_dim, edges.mesh)
            elif mode == "hybrid":
                # measured-best halves: stream forward + grouped backward
                # (v5e FINAL_L2_AB, benchmarks/tpu_batch_r4a.py)
                agg = rl.dense_basis_hybrid(
                    H, weight_f, comp_f, dense_basis_plan, edges.grp_src,
                    edges.grp_dst, edges.grp_norm, edges.group_rel,
                    edges.group_size, H.shape[-1], self.out_dim,
                    interpret=_interp())
            else:
                agg = rl.dense_basis(H, weight_f, comp_f, dense_basis_plan,
                                     H.shape[-1], self.out_dim,
                                     interpret=_interp())
        elif plan_f is not None:
            from mrgcn_tpu.ops import relational as rl
            W = rspmm._compose_weights(weight_f, comp_f)
            if plan_f.num_shards > 1 and edges.mesh is not None:
                agg = _dense_planned_sharded(H, W, plan_f, H.shape[-1],
                                             self.out_dim, edges.mesh)
            else:
                agg = rl.dense_aggregate(H, W, plan_f, H.shape[-1],
                                         self.out_dim,
                                         interpret=_interp())
        if agg is None and edges.grouped:
            agg = rspmm.transform_aggregate_grouped(
                H, edges.grp_src, edges.grp_dst, edges.grp_norm,
                edges.group_rel, edges.group_size, edges.num_out,
                weight_f, comp=comp_f)
        elif agg is None:
            agg = rspmm.transform_aggregate(
                H, edges.src, edges.dst, edges.rel, edges.norm,
                edges.num_out, weight_f, comp=comp_f)
        out = out + agg

        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_dim,))
        return out


class RGCN(nn.Module):
    """Stack of graph convolutions + optional DistMult relation embeddings
    (reference: models/rgcn.py:11-133)."""

    hidden_dims: Tuple[int, ...]   # output width of each layer
    num_relations: int
    num_nodes: int
    num_bases: int = 0
    p_dropout: float = 0.0
    featureless: bool = False
    use_bias: bool = False
    link_prediction: bool = False
    # input layer reuses comp_i for the feature weights when set
    # (reference: layers/graph.py:42-44, default False)
    shared_bases_weights: bool = False

    def setup(self):
        layers = []
        for i, out_dim in enumerate(self.hidden_dims):
            layers.append(RGCNLayer(
                out_dim=out_dim,
                num_relations=self.num_relations,
                num_nodes=self.num_nodes,
                num_bases=self.num_bases,
                input_layer=(i == 0),
                featureless=self.featureless and i == 0,
                use_bias=self.use_bias,
                shared_bases_weights=self.shared_bases_weights,
                name=f"layer_{i}"))
        self.layers = layers

        if self.link_prediction:
            # diag(R) relation vectors (reference: models/rgcn.py:55-61)
            self.relations = self.param(
                "relations", tinit.xavier_uniform(),
                (self.num_relations, self.hidden_dims[-1]))

    def _node_dropout(self, X: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Row-wise dropout via a dropped, rescaled ones vector
        (reference: models/rgcn.py:78-84)."""
        if self.p_dropout <= 0.0 or not train:
            return X
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.p_dropout, (X.shape[0],))
        scale = keep.astype(X.dtype) / (1.0 - self.p_dropout)
        return X * scale[:, None]

    def __call__(self, X: Optional[jnp.ndarray], edges,
                 train: bool = False) -> jnp.ndarray:
        """``edges``: one EdgeBlock (full batch) or a tuple of per-layer
        EdgeBlocks (mini batch; layer ``l`` consumes hop ``L-1-l``'s edges,
        reference: models/rgcn.py:91-128)."""
        num_layers = len(self.layers)
        per_layer = isinstance(edges, (tuple, list))
        for i, layer in enumerate(self.layers):
            X = layer(X, edges[i] if per_layer else edges)
            X = self._node_dropout(X, train)
            # NC leaves the output layer linear (logits); LP applies ReLU on
            # every layer — the reference builds all LP conv modules with
            # ReLU and has no separate output layer
            # (reference: link_prediction.py:449-464, node_classification.py:398-419)
            if i < num_layers - 1 or self.link_prediction:
                X = nn.relu(X)
        return X
