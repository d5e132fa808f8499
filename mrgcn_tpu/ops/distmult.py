"""DistMult scoring and full-entity ranking.

TPU re-design of reference: mrgcn/tasks/link_prediction.py:557-665. The
reference expands every fact to ``num_nodes`` candidate triples and scores
them in chunks via broadcasting; here the full-entity scores are a single
batched MXU matmul per chunk:

    head prediction: scores[f, n] = <E[n], R[p_f] * E[o_f]>  = (R_p*E_o) @ E^T
    tail prediction: scores[f, n] = <E[s_f] * R[p_f], E[n]>  = (E_s*R_p) @ E^T

Evaluation semantics are bit-comparable with the reference:

  * optimistic rank + half-tie correction
    ``rank = #(scores > true) + round((ties - 1) / 2) + 1`` with
    round-half-to-even, matching ``torch.round``
    (reference: link_prediction.py:632-643);
  * filtered ranking sets known-true candidates (except the target) to
    ``-inf`` before ranking (reference: link_prediction.py:557-573);
  * raw and filtered ranks are computed from the *same* score matrix, so a
    raw+filtered evaluation costs one scoring pass instead of the
    reference's two.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def score(s_idx, p_idx, o_idx, node_embeddings, edge_embeddings):
    """Per-triple DistMult score ``sum_h E[s] R[p] E[o]``
    (reference: link_prediction.py:645-665)."""
    s = node_embeddings[s_idx]
    p = edge_embeddings[p_idx]
    o = node_embeddings[o_idx]
    return jnp.sum(s * p * o, axis=-1)


def _chunk_ranks_impl(data, node_embeddings, edge_embeddings, filter_fact,
                      filter_cand, num_valid, head: bool):
    """Ranks for one chunk of facts, raw and filtered.

    ``data``: (F, 3) int32 (padded rows allowed — caller slices results).
    ``filter_fact``/``filter_cand``: (K,) int32 — known-true (fact, candidate)
    pairs to mask out in filtered mode; pad entries must hold out-of-range
    values (they are dropped).
    """
    s_idx, p_idx, o_idx = data[:, 0], data[:, 1], data[:, 2]
    F = data.shape[0]

    if head:
        part = edge_embeddings[p_idx] * node_embeddings[o_idx]  # (F, h)
        targets = s_idx
    else:
        part = node_embeddings[s_idx] * edge_embeddings[p_idx]
        targets = o_idx

    # HIGHEST: the TPU default lowers f32 matmuls to one-pass bf16, which
    # collapses near-equal scores into exact ties and changes the
    # tie-corrected ranks vs the f32 reference
    scores = jnp.dot(part, node_embeddings.T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (F, N)

    # mini-batch ranking: rows beyond the batch's real node count are
    # padding, never candidates. num_valid is traced (a jnp scalar) so
    # varying batch node counts do not trigger recompiles.
    col = jnp.arange(node_embeddings.shape[0])[None, :]
    scores = jnp.where(col < num_valid, scores, -jnp.inf)

    true_scores = jnp.take_along_axis(scores, targets[:, None], axis=1)

    def ranks_of(sc):
        greater = jnp.sum(sc > true_scores, axis=1)
        ties = jnp.sum(sc == true_scores, axis=1)
        # optimistic rank + half-tie correction with round-half-to-even
        # (reference: link_prediction.py:632-638). int32: ranks are
        # bounded by num_nodes, and int64 is unavailable under the
        # default x64-disabled config anyway (it warned every eval)
        return greater + jnp.round((ties - 1) / 2.0).astype(jnp.int32) + 1

    raw = ranks_of(scores)
    filtered_scores = scores.at[filter_fact, filter_cand].set(
        -jnp.inf, mode="drop")
    flt = ranks_of(filtered_scores)
    return raw, flt


_chunk_ranks = partial(jax.jit, static_argnames=("head",))(
    _chunk_ranks_impl)


@partial(jax.jit, static_argnames=("head",))
def _chunk_ranks_scan(chunks, node_embeddings, edge_embeddings, ffs, fcs,
                      num_valid, head: bool):
    """All of one direction's chunks as ONE device program (lax.scan):
    each remote execute costs ~5-10 ms of RPC round trip on a
    tunnel-attached device, so 40 per-chunk programs per direction were
    most of the post-RankPlan eval epoch. Sequential scan keeps the
    (chunk, N) score-matrix budget of the per-chunk path."""

    def body(_, x):
        chunk, ff, fc = x
        return None, _chunk_ranks_impl(chunk, node_embeddings,
                                       edge_embeddings, ff, fc,
                                       num_valid, head)

    _, (raw, flt) = jax.lax.scan(body, None, (chunks, ffs, fcs))
    return raw, flt


def truedicts(facts: np.ndarray) -> Tuple[Dict, Dict]:
    """(p, o) -> true heads and (s, p) -> true tails
    (reference: link_prediction.py:576-591)."""
    heads: Dict[Tuple[int, int], List[int]] = {}
    tails: Dict[Tuple[int, int], List[int]] = {}
    for s, p, o in np.asarray(facts):
        heads.setdefault((int(p), int(o)), []).append(int(s))
        tails.setdefault((int(s), int(p)), []).append(int(o))
    return heads, tails


def _filter_pairs(data: np.ndarray, heads: Dict, tails: Dict,
                  head: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Known-true (fact_row, candidate) pairs excluding the target itself
    (reference: link_prediction.py:557-573)."""
    fact_rows: List[int] = []
    cands: List[int] = []
    for i, (s, p, o) in enumerate(np.asarray(data)):
        s, p, o = int(s), int(p), int(o)
        if head:
            for si in heads.get((p, o), ()):
                if si != s:
                    fact_rows.append(i)
                    cands.append(si)
        else:
            for oi in tails.get((s, p), ()):
                if oi != o:
                    fact_rows.append(i)
                    cands.append(oi)
    return (np.asarray(fact_rows, dtype=np.int32),
            np.asarray(cands, dtype=np.int32))


class PendingRanks:
    """Handle for asynchronously dispatched ranking chunks.

    ``parts``: list of ``(meta, raw_stack, flt_stack)`` — one entry per
    direction, the stacks un-fetched ``(C, chunk_size)`` device results
    of a scanned dispatch, ``meta`` rows ``(out_begin, valid_len, row)``
    (padding past ``valid_len`` is discarded at collection).
    ``num_facts`` is the per-direction fact count; outputs are laid out
    ``[tail ranks, head ranks]`` (reference iterates head in
    [False, True]).
    """

    def __init__(self, parts, num_facts: int):
        self.parts = parts
        self.num_facts = num_facts


class RankPlan:
    """Host-prepared, device-resident ranking chunks for a STATIC fact
    set — built once, reused across evaluation epochs.

    Two costs the old per-call path paid at EVERY eval, on identical
    inputs, now happen once: (1) the Python ``truedicts``/``_filter_pairs``
    walk over all facts; (2) the per-chunk host->device transfers —
    ~3 arrays per chunk, ~50 ms each over a remote-attached device
    (240+ blocking puts per FB15k-scale eval: the measured wall of the
    5.9 s eval epoch). The plan uploads THREE stacked arrays total and
    chunks slice them device-side.
    """

    def __init__(self, chunk_meta, chunk_dev, ff_dev, fc_dev,
                 num_facts: int, nv_dev):
        self.chunk_meta = chunk_meta   # [(out_begin, valid, idx, head)]
        self.chunk_dev = chunk_dev     # (C, chunk_size, 3) int32
        self.ff_dev = ff_dev           # (C, Bk) int32
        self.fc_dev = fc_dev           # (C, Bk) int32
        self.num_facts = num_facts
        self.nv_dev = nv_dev


def prepare_rank_chunks_many(datas: List[np.ndarray], num_nodes: int,
                             chunk_size: int = 0,
                             num_valid: Optional[int] = None,
                             budget_elems: int = 2 ** 26
                             ) -> Tuple[RankPlan, List[Tuple[int, int]]]:
    """Host side of ranking for MANY fact subsets that share one
    embedding space: per-subset chunking/filter pairs (chunks never span
    subsets, so each subset keeps the reference's filter-against-its-own-
    facts semantics), stacked into ONE RankPlan — the whole eval
    dispatches as two scanned programs instead of 2 x num_subsets.

    Returns ``(plan, boundaries)``; ``boundaries[i] = (start, n)`` is
    subset ``i``'s fact range within each direction of the plan's output
    layout ``[all tails | all heads]``.
    """
    datas = [np.asarray(d) for d in datas]
    total = sum(d.shape[0] for d in datas)
    max_len = max((d.shape[0] for d in datas), default=0)
    if chunk_size <= 0:
        chunk_size = max_len

    # chunking exists purely to bound the (chunk, N) score matrix — results
    # are chunk-size independent — so grow the caller's hint (the reference's
    # mrr_batchsize memory knob) until the score matrix fills the
    # ``budget_elems`` budget (default 256 MiB of f32 scores); fewer,
    # larger device calls amortise dispatch overhead
    chunk_size = min(max(max_len, 1),
                     max(chunk_size, budget_elems // max(num_nodes, 1)))

    per_subset = [truedicts(d) for d in datas]

    boundaries: List[Tuple[int, int]] = []
    start = 0
    for d in datas:
        boundaries.append((start, d.shape[0]))
        start += d.shape[0]

    chunk_meta = []
    chunk_np: list = []
    filt: list = []
    offset = 0
    for head in (False, True):
        for d, (heads, tails), (sub_start, _) in zip(datas, per_subset,
                                                     boundaries):
            num_facts = d.shape[0]
            for begin in range(0, num_facts, chunk_size):
                end = min(begin + chunk_size, num_facts)
                chunk = d[begin:end]
                # pad to the static chunk size so XLA compiles once
                pad = chunk_size - (end - begin)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, 3), dtype=chunk.dtype)])
                ff, fc = _filter_pairs(d[begin:end], heads, tails, head)
                chunk_meta.append((offset + sub_start + begin,
                                   end - begin, len(chunk_np), head))
                chunk_np.append(chunk.astype(np.int32))
                filt.append((ff, fc))
        offset += total

    # one COMMON filter-pair bucket across chunks: a single compiled
    # program per direction and a rectangular stack; pads point at the
    # out-of-range fact row and are dropped by the scatter
    bucket = max(64, 1 << int(np.ceil(np.log2(
        max(max((len(ff) for ff, _ in filt), default=1), 1)))))
    ff_np = np.full((len(filt), bucket), chunk_size, dtype=np.int32)
    fc_np = np.zeros((len(filt), bucket), dtype=np.int32)
    for i, (ff, fc) in enumerate(filt):
        ff_np[i, :len(ff)] = ff
        fc_np[i, :len(fc)] = fc

    nv = num_nodes if num_valid is None else num_valid
    plan = RankPlan(chunk_meta,
                    jnp.asarray(np.stack(chunk_np) if chunk_np else
                                np.zeros((0, max(chunk_size, 1), 3),
                                         np.int32)),
                    jnp.asarray(ff_np), jnp.asarray(fc_np), total,
                    jnp.asarray(nv, dtype=jnp.int32))
    return plan, boundaries


def prepare_rank_chunks(data: np.ndarray, num_nodes: int,
                        chunk_size: int = 0,
                        true_facts: Optional[np.ndarray] = None,
                        num_valid: Optional[int] = None,
                        budget_elems: int = 2 ** 26) -> RankPlan:
    """Host side of :func:`launch_ranks`: chunking, filter pairs, padding
    and ONE batched upload. See :class:`RankPlan`. ``true_facts``
    overrides the filter-pair fact set (defaults to ``data``)."""
    if true_facts is None:
        plan, _ = prepare_rank_chunks_many(
            [data], num_nodes, chunk_size=chunk_size,
            num_valid=num_valid, budget_elems=budget_elems)
        return plan

    # explicit filter set: single-subset build with custom truedicts
    data = np.asarray(data)
    num_facts = data.shape[0]
    if chunk_size <= 0:
        chunk_size = num_facts
    chunk_size = min(max(num_facts, 1),
                     max(chunk_size, budget_elems // max(num_nodes, 1)))
    heads, tails = truedicts(true_facts)

    chunk_meta = []
    chunk_np: list = []
    filt: list = []
    offset = 0
    for head in (False, True):
        for begin in range(0, num_facts, chunk_size):
            end = min(begin + chunk_size, num_facts)
            chunk = data[begin:end]
            pad = chunk_size - (end - begin)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, 3), dtype=chunk.dtype)])
            ff, fc = _filter_pairs(data[begin:end], heads, tails, head)
            chunk_meta.append((offset + begin, end - begin,
                               len(chunk_np), head))
            chunk_np.append(chunk.astype(np.int32))
            filt.append((ff, fc))
        offset += num_facts

    bucket = max(64, 1 << int(np.ceil(np.log2(
        max(max((len(ff) for ff, _ in filt), default=1), 1)))))
    ff_np = np.full((len(filt), bucket), chunk_size, dtype=np.int32)
    fc_np = np.zeros((len(filt), bucket), dtype=np.int32)
    for i, (ff, fc) in enumerate(filt):
        ff_np[i, :len(ff)] = ff
        fc_np[i, :len(fc)] = fc

    nv = num_nodes if num_valid is None else num_valid
    return RankPlan(chunk_meta,
                    jnp.asarray(np.stack(chunk_np) if chunk_np else
                                np.zeros((0, chunk_size, 3), np.int32)),
                    jnp.asarray(ff_np), jnp.asarray(fc_np), num_facts,
                    jnp.asarray(nv, dtype=jnp.int32))


def launch_ranks_plan(plan: RankPlan, node_embeddings,
                      edge_embeddings) -> PendingRanks:
    """Dispatch a prepared :class:`RankPlan` as ONE scanned device
    program per direction (async; no host transfers — the chunk stacks
    are device-resident)."""
    C = int(plan.chunk_dev.shape[0])
    if C == 0:
        return PendingRanks([], plan.num_facts)
    C2 = C // 2   # prepare emits all tail-direction chunks, then head
    parts = []
    for head, sl in ((False, slice(0, C2)), (True, slice(C2, C))):
        meta = [(ob, v, i - sl.start)
                for ob, v, i, h in plan.chunk_meta if h == head]
        raw, flt = _chunk_ranks_scan(
            plan.chunk_dev[sl], node_embeddings, edge_embeddings,
            plan.ff_dev[sl], plan.fc_dev[sl], plan.nv_dev, head)
        parts.append((meta, raw, flt))
    return PendingRanks(parts, plan.num_facts)


def launch_ranks(data: np.ndarray, node_embeddings, edge_embeddings,
                 chunk_size: int = 0,
                 true_facts: Optional[np.ndarray] = None,
                 num_valid: Optional[int] = None,
                 budget_elems: int = 2 ** 26) -> PendingRanks:
    """Dispatch all ranking chunks for ``data`` WITHOUT blocking on any
    device result — JAX queues the compiled programs and returns device
    futures. Use :func:`collect_ranks` (or :func:`collect_many`, which
    batches the device->host fetch across subsets) to materialise.

    Mirrors ``compute_ranks_fast`` (reference: link_prediction.py:593-643):
    output layout is ``[tail ranks, head ranks]`` — the reference iterates
    ``head in [False, True]`` — and ranks are 1-based.

    ``true_facts`` provides the fact set for filtering (defaults to
    ``data``); ``chunk_size <= 0`` scores all facts in one chunk. Repeat
    callers over the same facts should :func:`prepare_rank_chunks` once
    and :func:`launch_ranks_plan` per eval (the drivers do).
    """
    plan = prepare_rank_chunks(
        data, int(node_embeddings.shape[0]), chunk_size=chunk_size,
        true_facts=true_facts, num_valid=num_valid,
        budget_elems=budget_elems)
    return launch_ranks_plan(plan, node_embeddings, edge_embeddings)


def collect_many(pendings: List[PendingRanks]
                 ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Materialise many :class:`PendingRanks` with ONE device->host fetch.

    Every chunk's (raw, flt) pair is concatenated into a single device
    array and fetched in one transfer — the per-chunk blocking
    ``np.asarray`` round trips (the dominant cost of a multi-subset eval
    epoch on a remote device: ~160 sequential fetches at FB15k-237 scale)
    collapse into one.
    """
    all_dev: List = []
    for p in pendings:
        for _, raw, flt in p.parts:
            all_dev.append(raw.reshape(-1))
            all_dev.append(flt.reshape(-1))
    if not all_dev:
        return [(np.zeros(0, np.int64), np.zeros(0, np.int64))
                for _ in pendings]
    flat = np.asarray(jnp.concatenate(all_dev))

    results = []
    pos = 0
    for p in pendings:
        raw_out = np.empty(p.num_facts * 2, dtype=np.int64)
        flt_out = np.empty(p.num_facts * 2, dtype=np.int64)
        for meta, raw, flt in p.parts:
            C, csize = raw.shape
            raw_np = flat[pos:pos + C * csize].reshape(C, csize)
            pos += C * csize
            flt_np = flat[pos:pos + C * csize].reshape(C, csize)
            pos += C * csize
            for out_begin, valid, row in meta:
                raw_out[out_begin:out_begin + valid] = raw_np[row, :valid]
                flt_out[out_begin:out_begin + valid] = flt_np[row, :valid]
        results.append((raw_out, flt_out))
    return results


def compute_ranks(data: np.ndarray, node_embeddings, edge_embeddings,
                  chunk_size: int = 0,
                  true_facts: Optional[np.ndarray] = None,
                  num_valid: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Raw + filtered ranks for head and tail prediction over all facts —
    :func:`launch_ranks` + a blocking collect. See ``launch_ranks`` for
    semantics (reference: link_prediction.py:593-643)."""
    return collect_many([launch_ranks(
        data, node_embeddings, edge_embeddings, chunk_size=chunk_size,
        true_facts=true_facts, num_valid=num_valid)])[0]


def mrr_hits(ranks: np.ndarray, K=(1, 3, 10)) -> Tuple[float, List[float]]:
    """Mean reciprocal rank and hits@K for a rank vector."""
    ranks = np.asarray(ranks, dtype=np.float64)
    mrr = float(np.mean(1.0 / ranks))
    hits = [float(np.mean(ranks <= k)) for k in K]
    return mrr, hits
