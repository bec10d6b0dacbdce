"""Lane-major batched finite-width SA engine.

The finite-width counterpart of :mod:`tnco_tpu.kernels.sa_batched`: replica
-minor state with one-hot masked dense ops instead of gather/scatter HLOs,
plus the slice lanes and width caches of
:mod:`tnco_tpu.kernels.sa_finite`.  PRNG usage per replica mirrors
``sa_finite.sweep_fw`` exactly (5-way splits per walk step, one reslice key
per sweep), so trajectories are bit-identical to the vmapped engine.
"""

import functools as fts

import jax
import jax.numpy as jnp
import numpy as np

from tnco_tpu.kernels import sa_finite as saf
from tnco_tpu.kernels.sa_batched import (_log2_total_b, _width_b,
                                         compute_hyper_b)
from tnco_tpu.kernels.sa_finite import SweepConfigFW, _WIDTH_EPS
from tnco_tpu.ops import costs as costs_ops

__all__ = ['SABatchFW', 'init_batch_fw', 'run_sweeps_fw_batched',
           'replica_state_fw']


@jax.tree_util.register_pytree_node_class
class SABatchFW:
    """Replica-minor finite-width state.

    Extends the IM batch with ``slices/min_slices: uint32[W, B]`` and
    ``width: f32[N, B]`` (pre-slicing widths).
    """

    __slots__ = ('c0', 'c1', 'par', 'inds', 'hyper', 'lcc', 'width',
                 'slices', 'log2_total', 'min_log2_total', 'min_c0',
                 'min_c1', 'min_par', 'min_inds', 'min_slices', 'keys')

    def __init__(self, c0, c1, par, inds, hyper, lcc, width, slices,
                 log2_total, min_log2_total, min_c0, min_c1, min_par,
                 min_inds, min_slices, keys):
        self.c0 = c0
        self.c1 = c1
        self.par = par
        self.inds = inds
        self.hyper = hyper
        self.lcc = lcc
        self.width = width
        self.slices = slices
        self.log2_total = log2_total
        self.min_log2_total = min_log2_total
        self.min_c0 = min_c0
        self.min_c1 = min_c1
        self.min_par = min_par
        self.min_inds = min_inds
        self.min_slices = min_slices
        self.keys = keys

    def tree_flatten(self):
        return ((self.c0, self.c1, self.par, self.inds, self.hyper,
                 self.lcc, self.width, self.slices, self.log2_total,
                 self.min_log2_total, self.min_c0, self.min_c1,
                 self.min_par, self.min_inds, self.min_slices, self.keys),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def from_states_fw(states) -> SABatchFW:
    """Stacks per-replica ``SAStateFW`` into a replica-minor batch."""
    stack = jax.tree.map(lambda *xs: jnp.stack(xs, axis=-1), *states)
    nodes, min_nodes = stack.nodes, stack.min_nodes
    keys = jnp.stack([s.key for s in states])
    return SABatchFW(nodes[:, 0, :], nodes[:, 1, :], nodes[:, 2, :],
                     stack.inds, stack.hyper, stack.lcc, stack.width,
                     stack.slices, stack.log2_total, stack.min_log2_total,
                     min_nodes[:, 0, :], min_nodes[:, 1, :],
                     min_nodes[:, 2, :], stack.min_inds, stack.min_slices,
                     keys)


def replica_state_fw(batch: SABatchFW, i: int):
    """Extracts replica ``i`` back into a ``SAStateFW``."""
    from tnco_tpu.kernels.sa_finite import SAStateFW

    nodes = jnp.stack([batch.c0[:, i], batch.c1[:, i], batch.par[:, i]],
                      axis=1)
    min_nodes = jnp.stack(
        [batch.min_c0[:, i], batch.min_c1[:, i], batch.min_par[:, i]],
        axis=1)
    return SAStateFW(nodes, batch.inds[..., i], batch.hyper[..., i],
                     batch.lcc[:, i], batch.width[:, i],
                     batch.slices[..., i], batch.log2_total[i],
                     batch.min_log2_total[i], min_nodes,
                     batch.min_inds[..., i], batch.min_slices[..., i],
                     batch.keys[i])


def _pc_width(lanes, uniform_log2, dtype, sparse_wb, log2_n_projs,
              word_axis):
    """Popcount width fast path for UNIFORM index dims.

    ``width = log2(dim) * popcount`` — bitwise-identical to the pinned
    pairwise tree whenever ``log2(dim)`` is exactly representable and
    its multiples are exact (dim 2: always; any power of two: always),
    ulp-close otherwise.  Callers gate on ``uniform_log2_dim``.
    """
    def pc(x):
        return jnp.sum(jax.lax.population_count(x).astype(jnp.int32),
                       axis=word_axis).astype(dtype)

    u = jnp.asarray(uniform_log2, dtype)
    if sparse_wb is None:
        return pc(lanes) * u
    shape = [1] * lanes.ndim
    shape[word_axis] = -1
    sp = sparse_wb.reshape(shape)
    return (pc(lanes & ~sp) * u +
            jnp.minimum(pc(lanes & sp) * u, log2_n_projs))


def _lcc_fw_b(c0, c1, inds, slices, log2d_w32, sparse_wb, log2_n_projs,
              uniform_log2=None):
    """[N, B] slice-aware log2 cost per node (leaves -> -inf).

    With uniform dims the child-row reads go through
    ``pallas_gather.gather_gbn`` (XLA lowers the lane-varying
    ``take_along_axis`` to a scalar loop on TPU; the gather moves bits,
    so values are identical either way).
    """
    internal = c0 != -1
    if uniform_log2 is not None:
        from tnco_tpu.kernels.pallas_gather import gather_gbn

        inds_wbn = jnp.transpose(inds, (1, 2, 0))       # [W, B, N]
        ids0 = jnp.where(internal, c0, -1).T             # [B, N]
        ids1 = jnp.where(internal, c1, -1).T
        union = (gather_gbn(inds_wbn, ids0) |
                 gather_gbn(inds_wbn, ids1) |
                 slices[:, :, None])                     # [W, B, N]
        lcc = _pc_width(union, uniform_log2, log2d_w32.dtype,
                        None if sparse_wb is None else
                        sparse_wb.reshape(-1),
                        log2_n_projs, word_axis=0).T     # [N, B]
    else:
        c0s = jnp.where(internal, c0, 0)
        c1s = jnp.where(internal, c1, 0)
        inds_c0 = jnp.take_along_axis(inds, c0s[:, None, :], axis=0)
        inds_c1 = jnp.take_along_axis(inds, c1s[:, None, :], axis=0)
        union = inds_c0 | inds_c1 | slices[None, :, :]

        def w_one(u):
            return _width_b(u, log2d_w32, sparse_wb=sparse_wb,
                            log2_n_projs=log2_n_projs)

        lcc = jax.vmap(w_one)(union)  # over node axis
    return jnp.where(internal, lcc, -jnp.inf).astype(log2d_w32.dtype)


def _greedy_slices_fast(inds, width, keys_jitter, max_width, log2d_w32,
                        skip_wb, uniform_log2, window=128, vals=None,
                        vals_planes=None):
    """Sorted-space greedy slicer for UNIFORM power-of-two dims.

    Output-identical to the reference path in ``_greedy_slices_b`` (and
    so to the vmapped ``sa_finite.greedy_slices``), restructured for the
    TPU: the reference path's sequential per-node rounds each pay a
    lane-varying row gather, a [n_bits, B] permutation gather, a cumsum
    and a scatter (~3 ms/node at Sycamore shapes), plus a full all-node
    width recompute per round.  This path exploits three exact
    identities:

    - widths only shrink as slices grow, so the ENTRY over-width set
      (``width > max_width``) is a superset of every node that can need
      slicing, and the per-round width refresh is unnecessary — each
      node's CURRENT sliced width is re-derived exactly at its turn;
    - the score order is fixed for the whole call, so the loop can run
      entirely in sorted score space: the over rows are gathered ONCE
      (``pallas_gather.gather_gbn``) and permuted ONCE at word level,
      and the final slice set is permuted back ONCE at exit — no
      per-node gathers or scatters remain;
    - with uniform power-of-two dims every width is ``log2(dim) * an
      exact integer count``, so the candidates-before prefix can be an
      exact 128-block bf16 triangular matmul on the MXU instead of a
      cumsum (f32 MACs of 0/1 values, counts <= 127 per block).

    Per-iteration work is then a handful of [B, n_bits] elementwise
    tiles (~0.1 ms vs ~3 ms), and the loop trip count is the actual
    max over-node count instead of padded rounds.  Reference semantics:
    include/tnco/optimize/finite_width/greedy/utils.hpp:24-125.
    """
    # ``vals``/``vals_planes``: plane-layout callers (the walks engine)
    # pass their packed ``[F, B, N]`` state + the index-plane range
    # directly so the row gathers read it in place — ``inds`` may then
    # be None (only its shape is needed; values are identical since the
    # planes ARE the index words).
    if vals is not None:
        lo, hi = vals_planes
        n, w, b = vals.shape[2], hi - lo, vals.shape[1]
    else:
        n, w, b = inds.shape
    n_bits = w * 32
    nbp = max(128, -(-n_bits // 128) * 128)
    dtype = log2d_w32.dtype
    log2d_flat = log2d_w32.reshape(n_bits)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    ul = jnp.asarray(uniform_log2, dtype)
    window = min(window, n)

    from tnco_tpu.kernels.pallas_gather import gather_bn, gather_gbn

    # --- entry: score order ---
    # Entry over-node ids, ascending per replica (id processing order).
    iota_n = jnp.arange(n, dtype=jnp.int32)
    over0 = width > max_width + _WIDTH_EPS
    ids_sorted = jnp.sort(
        jnp.where(over0, iota_n[:, None], jnp.int32(n)), axis=0)
    max_count = jnp.max(jnp.sum(over0.astype(jnp.int32), axis=0))

    if vals is not None:
        def gather_rows(ids_bk):
            return gather_gbn(vals, ids_bk, planes=vals_planes)
    else:
        inds_wbn = jnp.transpose(inds, (1, 2, 0))           # [w, b, n]

        def gather_rows(ids_bk):
            return gather_gbn(inds_wbn, ids_bk)

    # n_big[j, b] = #over-width nodes whose index set contains bit j.
    # The reference formulation is an all-nodes einsum against an
    # [n, 32, b] float bit expansion per word (GBs of traffic at
    # Sycamore scale for a handful of over rows); summing the bits of
    # only the gathered over rows is the same exact integer count.
    # Windowed over the same id list the selection loop walks; pad ids
    # (-1) gather all-zero rows and contribute nothing.
    def nbig_body(carry):
        acc, offset = carry
        ids_w = jax.lax.dynamic_slice(ids_sorted, (offset, 0),
                                      (window, b))
        ids_bk = jnp.where(ids_w < n, ids_w, -1).T           # [b, K]
        rows = gather_rows(ids_bk)                           # [w, b, K]
        bits = ((rows[:, :, :, None] >> shifts) &
                jnp.uint32(1)).astype(jnp.int32)
        return acc + jnp.sum(bits, axis=2), offset + jnp.int32(window)

    acc0 = jnp.zeros((w, b, 32), jnp.int32)
    acc, _ = jax.lax.while_loop(lambda c: c[1] < max_count, nbig_body,
                                (acc0, jnp.int32(0)))
    n_big = jnp.transpose(acc, (0, 2, 1)).reshape(n_bits, b) \
        .astype(dtype)                                       # [n_bits, b]
    jitter = jax.vmap(
        lambda k: jax.random.uniform(k, (n_bits,), dtype=dtype))(
            keys_jitter).T  # [n_bits, b]
    score = n_big * 1e6 + log2d_flat[:, None] + 1e-4 * jitter
    order = jnp.argsort(-score, axis=0)  # [n_bits, b]
    inv = jnp.argsort(order, axis=0)     # inverse permutation

    # Sorted-space addressing: sorted position q of replica b reads bit
    # ``order[q, b]`` = word ``order >> 5``, bit ``order & 31``.  Pad
    # the sorted axis to a lane multiple; pad ids -1 -> zero bits.
    ord_bq = order.T.astype(jnp.int32)                      # [b, n_bits]
    word_q = jnp.pad(ord_bq >> 5, ((0, 0), (0, nbp - n_bits)),
                     constant_values=-1)
    bit_q = jnp.pad((ord_bq & 31).astype(jnp.uint32),
                    ((0, 0), (0, nbp - n_bits)))

    skip_words = jnp.broadcast_to(
        jnp.asarray(skip_wb).reshape(1, w), (b, w)).astype(jnp.uint32)
    skip_srt = ((gather_bn(skip_words, word_q) >>
                 bit_q) & jnp.uint32(1)).astype(jnp.int8)   # [b, nbp]
    not_skip = (jnp.int8(1) - skip_srt) * jnp.pad(
        jnp.ones((b, n_bits), jnp.int8),
        ((0, 0), (0, nbp - n_bits)))

    i128 = jnp.arange(128)
    stl128 = (i128[:, None] < i128[None, :]).astype(jnp.bfloat16)
    max_w = jnp.asarray(max_width, dtype)

    def one_node(k, sl, bits_srt):
        xs = jax.lax.dynamic_index_in_dim(bits_srt, k, axis=0,
                                          keepdims=False)   # [b, nbp]
        avail = xs * (jnp.int8(1) - sl)
        cnt = jnp.sum(avail.astype(jnp.int32), axis=1)
        sw = cnt.astype(dtype) * ul                          # exact
        cand = avail * not_skip
        c3 = cand.reshape(b, nbp // 128, 128)
        within = jnp.einsum('bnk,kl->bnl', c3.astype(jnp.bfloat16),
                            stl128,
                            preferred_element_type=jnp.float32)
        blocks = jnp.sum(c3.astype(jnp.int32), axis=2)       # [b, nblk]
        bprefix = (jnp.cumsum(blocks, axis=1) - blocks).astype(dtype)
        cb = bprefix[:, :, None] + within.astype(dtype)      # exact ints
        w_before = sw[:, None, None] - ul * cb
        selected = (c3 > 0) & (w_before > max_w + _WIDTH_EPS)
        return sl | selected.reshape(b, nbp).astype(jnp.int8)

    def window_body(carry):
        sl, offset = carry
        ids_w = jax.lax.dynamic_slice(ids_sorted, (offset, 0),
                                      (window, b))
        ids_bk = jnp.where(ids_w < n, ids_w, -1).T           # [b, window]
        g1 = gather_rows(ids_bk)                             # [w, b, K]
        rows_wb = jnp.transpose(g1, (2, 1, 0))               # [K, b, w]
        word_srt = gather_gbn(rows_wb, word_q)               # [K, b, nbp]
        bits_srt = ((word_srt >> bit_q[None]) &
                    jnp.uint32(1)).astype(jnp.int8)
        trip = jnp.clip(max_count - offset, 0, window)
        sl = jax.lax.fori_loop(
            0, trip, lambda k, s: one_node(k, s, bits_srt), sl)
        return sl, offset + jnp.int32(window)

    sl0 = jnp.zeros((b, nbp), jnp.int8)
    sl, _ = jax.lax.while_loop(lambda c: c[1] < max_count, window_body,
                               (sl0, jnp.int32(0)))

    # Back to lane space: lane bit j of replica b = sl[b, inv[j, b]].
    lane_bits = gather_bn(sl.astype(jnp.int32),
                          inv.T.astype(jnp.int32))           # [b, n_bits]
    lb = lane_bits.reshape(b, w, 32).astype(jnp.uint32)
    packed = jnp.sum(lb << shifts[None, None, :], axis=2,
                     dtype=jnp.uint32)
    return packed.T                                          # [w, b]


def _greedy_slices_b(c0, inds, width, keys_jitter, max_width, log2d_w32,
                     skip_wb, sparse_wb, log2_n_projs,
                     uniform_log2=None):
    """Lane-major greedy slicer (see sa_finite.greedy_slices).

    Mirrors the vmapped slicer exactly, including per-replica jitter keys.
    Returns ``uint32[W, B]`` slice lanes.

    ``uniform_log2``: common log2 dim enabling the popcount width fast
    path in the per-round all-node width recompute — the slicer's
    dominant cost (bitwise-identical for power-of-two dims; see
    ``_pc_width``).  With uniform dims and no sparse indices the whole
    slicer runs on the sorted-space path (``_greedy_slices_fast``),
    which is output-identical on every platform.  The fast path
    additionally requires an INTEGER ``log2(dim)`` (power-of-two dims):
    its single-multiply ``log2(dim) * count`` widths are exact there,
    whereas the reference path's iterated cumsum of a non-representable
    ``log2(dim)`` rounds differently.
    """
    if (uniform_log2 is not None and sparse_wb is None
            and float(uniform_log2).is_integer()):
        return _greedy_slices_fast(inds, width, keys_jitter, max_width,
                                   log2d_w32, skip_wb, uniform_log2)
    n, w, b = inds.shape
    n_bits = w * 32
    dtype = log2d_w32.dtype
    log2d_flat = log2d_w32.reshape(n_bits)

    shifts = jnp.arange(32, dtype=jnp.uint32)

    def expand(lanes_wb):  # [w, b] -> [n_bits, b]
        bits = (lanes_wb[:, None, :] >> shifts[None, :, None]) & \
            jnp.uint32(1)
        return bits.reshape(n_bits, b).astype(dtype)

    big = (width > max_width + _WIDTH_EPS).astype(dtype)  # [n, b]
    # n_big[i, b] = sum_nodes big * bit  — per word to bound memory
    n_big = jnp.concatenate([
        jnp.einsum(
            'nb,njb->jb',
            big,
            ((inds[:, word, None, :] >> shifts[None, :, None]) &
             jnp.uint32(1)).astype(dtype)) for word in range(w)
    ], axis=0)  # [n_bits, b]

    jitter = jax.vmap(
        lambda k: jax.random.uniform(k, (n_bits,), dtype=dtype))(
            keys_jitter).T  # [n_bits, b]
    score = n_big * 1e6 + log2d_flat[:, None] + 1e-4 * jitter
    order = jnp.argsort(-score, axis=0)  # [n_bits, b]

    log2d_sorted = jnp.take_along_axis(
        jnp.broadcast_to(log2d_flat[:, None], (n_bits, b)), order, axis=0)
    skip_full = jnp.broadcast_to(skip_wb.reshape(w, 1), (w, b))
    skip_sorted = jnp.take_along_axis(expand(skip_full), order, axis=0)
    if sparse_wb is not None:
        sparse_full = jnp.broadcast_to(sparse_wb.reshape(w, 1), (w, b))
        sparse_sorted = jnp.take_along_axis(expand(sparse_full), order,
                                            axis=0)
    else:
        sparse_sorted = None

    def w_of(lanes_wb):
        return _width_b(lanes_wb, log2d_w32, sparse_wb=sparse_wb,
                        log2_n_projs=log2_n_projs)

    # Sliced widths of ALL nodes, chunked over the node axis so the
    # expanded-bit temporaries stay bounded at Sycamore scale.  vmapping
    # w_of adds a batch axis to elementwise ops only, so each node's f32
    # width is IDENTICAL to a direct w_of call (engine bit-identity).
    chunk = 64
    n_pad = -(-n // chunk) * chunk
    inds_pad = inds if n_pad == n else jnp.concatenate(
        [inds, jnp.zeros((n_pad - n, w, b), jnp.uint32)])

    def all_sw(slices):
        sliced = inds_pad & ~slices[None]
        if uniform_log2 is not None:
            return _pc_width(sliced, uniform_log2, dtype,
                             None if sparse_wb is None else
                             sparse_wb.reshape(-1),
                             log2_n_projs, word_axis=1)[:n]
        out = jax.lax.map(jax.vmap(w_of),
                          sliced.reshape(n_pad // chunk, chunk, w, b))
        return out.reshape(n_pad, b)[:n]

    def select_at(slices, t_star, sw, active):
        """The v1 per-node selection, applied at node ``t_star[b]``."""
        xs = jnp.take_along_axis(inds, t_star[None, None, :], axis=0)[0]
        sliced = xs & ~slices

        cand_sorted = jnp.take_along_axis(expand(sliced), order,
                                          axis=0) * (1.0 - skip_sorted)

        if sparse_sorted is None:
            removed = cand_sorted * log2d_sorted
            cum = jnp.cumsum(removed, axis=0) - removed
            w_before = sw[None, :] - cum
        else:
            dense_rm = cand_sorted * log2d_sorted * (1 - sparse_sorted)
            sp_rm = cand_sorted * log2d_sorted * sparse_sorted
            cum_d = jnp.cumsum(dense_rm, axis=0) - dense_rm
            cum_s = jnp.cumsum(sp_rm, axis=0) - sp_rm
            w_d0 = _width_b(sliced & ~sparse_wb, log2d_w32)
            w_s0 = _width_b(sliced & sparse_wb, log2d_w32)
            w_before = (w_d0[None, :] - cum_d +
                        jnp.minimum(w_s0[None, :] - cum_s, log2_n_projs))

        selected_sorted = ((cand_sorted > 0) &
                           (w_before > max_width + _WIDTH_EPS) &
                           active[None, :])
        # scatter back to index space per lane
        selected = jnp.zeros((n_bits, b), jnp.bool_)
        selected = jax.vmap(
            lambda sel, ord_, out: out.at[ord_].set(sel),
            in_axes=(1, 1, 1), out_axes=1)(selected_sorted, order,
                                           selected)
        sel_bits = selected.reshape(w, 32, b)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        sel_lanes = jnp.sum(
            sel_bits * weights[None, :, None], axis=1,
            dtype=jnp.uint32)
        return slices | sel_lanes

    # Process only the nodes that actually need new slices, first-over
    # node per round.  Output-identical to the v1 single pass over all N
    # nodes (greedy/utils.hpp:24-125 order): slices only grow, so widths
    # only shrink — a node that fit at its turn never becomes over-width
    # later, each needy node is processed at most once, and the first
    # still-over node is always past every previously processed one.
    # Rounds ~ #needy nodes (tens) instead of N (thousands).
    slices0 = jnp.zeros((w, b), dtype=jnp.uint32)
    processed0 = jnp.zeros((n, b), dtype=jnp.bool_)
    iota_nodes = jnp.arange(n, dtype=jnp.int32)[:, None]

    def cond(carry):
        _, w_cur, processed, r = carry
        over = (~processed) & (w_cur > max_width + _WIDTH_EPS)
        return jnp.any(over) & (r < n)

    # With the uniform popcount width, K needy nodes are processed per
    # full-width recompute: the inner steps re-derive the processed
    # node's CURRENT sliced width with a cheap exact popcount, so the
    # node order (first-over by node id) and every selection are
    # OUTPUT-IDENTICAL to the one-node-per-round loop — widths only
    # shrink, so the stale `over` mask is a superset and a node that
    # meanwhile fits contributes nothing (tests assert equality).  The
    # all-node width recompute is the reslice's dominant stream, so
    # this cuts it ~K-fold.
    k_batch = 8 if uniform_log2 is not None else 1

    def one_node(carry2):
        slices, w_cur, processed = carry2
        over = (~processed) & (w_cur > max_width + _WIDTH_EPS)
        active = jnp.any(over, axis=0)                       # [b]
        t_star = jnp.argmax(over, axis=0).astype(jnp.int32)  # first over
        if uniform_log2 is not None:
            xs = jnp.take_along_axis(inds, t_star[None, None, :],
                                     axis=0)[0]
            sw = _pc_width(xs & ~slices, uniform_log2, dtype,
                           None if sparse_wb is None else
                           sparse_wb.reshape(-1),
                           log2_n_projs, word_axis=0)
            active = active & (sw > max_width + _WIDTH_EPS)
        else:
            sw = jnp.take_along_axis(w_cur, t_star[None, :], axis=0)[0]
        slices = select_at(slices, t_star, sw, active)
        processed = processed | ((iota_nodes == t_star[None, :]) &
                                 jnp.any(over, axis=0)[None, :])
        return (slices, w_cur, processed)

    def round_body(carry):
        slices, w_cur, processed, r = carry
        slices, _, processed = jax.lax.fori_loop(
            0, k_batch, lambda _i, c2: one_node(c2),
            (slices, w_cur, processed))
        return (slices, all_sw(slices), processed, r + k_batch)

    carry = (slices0, all_sw(slices0), processed0, jnp.int32(0))
    slices, _, _, _ = jax.lax.while_loop(cond, round_body, carry)
    return slices


def _sweep_fw_batched(carry, beta, update_slices, max_width, log2d_w32,
                      skip_wb, cfg: SweepConfigFW, iota_n, sparse_wb,
                      log2_n_projs, uniform_log2=None):
    (c0, c1, par, inds, lcc, width, slices, _lt_prev, min_lt,
     min_c0, min_c1, min_par, min_inds, min_slices, keys) = carry
    n_leaves = cfg.n_leaves
    n, w, b = inds.shape

    split2 = jax.vmap(lambda k: tuple(jax.random.split(k)))
    split5 = jax.vmap(lambda k: tuple(jax.random.split(k, 5)))
    randleaf = jax.vmap(lambda k: jax.random.randint(k, (), 0, n_leaves))
    bern = jax.vmap(jax.random.bernoulli)
    unif = jax.vmap(
        lambda k: jax.random.uniform(k, dtype=log2d_w32.dtype))

    keys, k_leaf = split2(keys)
    leaf = randleaf(k_leaf)

    def row_mask(pos):
        return iota_n == pos[None, :]

    def grow_i(arr, mask):
        return jnp.sum(jnp.where(mask, arr, 0), axis=0,
                       dtype=arr.dtype)

    def grow_f(arr, mask):
        return jnp.sum(jnp.where(mask, arr, 0.0), axis=0)

    def grow_u(arr, mask):
        return jnp.sum(jnp.where(mask[:, None, :], arr, jnp.uint32(0)),
                       axis=0, dtype=jnp.uint32)

    def wfn(lanes_wb):
        return _width_b(lanes_wb, log2d_w32, sparse_wb=sparse_wb,
                        log2_n_projs=log2_n_projs)

    lt0 = _log2_total_b(lcc, n_leaves)
    pos_b0 = grow_i(par, row_mask(leaf))

    if cfg.prob_kind == 'mh':
        def accept_fn(log2_u, l_new, l_old):
            return log2_u <= -beta * (l_new - l_old)
    elif cfg.prob_kind == 'greedy':
        def accept_fn(log2_u, l_new, l_old):
            return l_new <= l_old
    else:
        def accept_fn(log2_u, l_new, l_old):
            return jnp.ones_like(l_new, dtype=bool)

    def cond(cy):
        return jnp.any(cy[-1])

    def body(cy):
        (c0, c1, par, inds, lcc, width, slices, lt, pos_b, keys,
         moves, active) = cy
        keys_new, k_pick, k_u, k_slices, k_u2 = split5(keys)

        bq = pos_b
        m_b = row_mask(bq)
        a = grow_i(par, m_b)
        c0b = grow_i(c0, m_b)
        c1b = grow_i(c1, m_b)
        m_a = row_mask(a)
        c0a = grow_i(c0, m_a)
        c1a = grow_i(c1, m_a)
        c = jnp.where(c0a == bq, c1a, c0a)
        m_c = row_mask(c)

        inds_c = grow_u(inds, m_c)
        inds0 = grow_u(inds, row_mask(c0b))
        inds1 = grow_u(inds, row_mask(c1b))
        i0 = jnp.any(inds0 & inds_c, axis=0)
        i1 = jnp.any(inds1 & inds_c, axis=0)
        both = i0 & i1
        rand_bit = bern(k_pick)
        take0 = jnp.where(cfg.disable_shared_inds | both, rand_bit, i0)
        e = jnp.where(take0, c1b, c0b)
        m_e = row_mask(e)
        t0m = take0[None, :]
        inds_d = jnp.where(t0m, inds0, inds1)
        inds_e = jnp.where(t0m, inds1, inds0)

        inds_a = grow_u(inds, m_a)
        inds_b = grow_u(inds, m_b)
        hyp_a = inds_a & inds_b & inds_c
        hyp_b = inds_b & inds0 & inds1
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        new_width_b = wfn(new_inds_b)
        new_sliced_width_b = wfn(new_inds_b & ~slices)
        fits = new_sliced_width_b <= max_width + _WIDTH_EPS

        l_a = grow_f(lcc, m_a)
        l_b = grow_f(lcc, m_b)
        ln_b = wfn(inds_d | inds_c | slices)
        ln_a = wfn(new_inds_b | inds_e | slices)
        l_new = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b)

        u = unif(k_u)
        accept = active & fits & accept_fn(jnp.log2(u), l_new, lt)

        rescued = jnp.zeros_like(accept)
        lcc_try = lcc
        if cfg.max_new_slices > 0:
            # Rescue branch (greedy/optimizer.hpp:226-321): per-lane vmap
            # of the exact single-replica functions so trajectories stay
            # bit-identical to the vmapped engine.  O(N*W) per move —
            # throughput-sensitive runs keep the app default of 0.
            log2d_flat = log2d_w32.reshape(-1)
            sparse_flat = None if sparse_wb is None else sparse_wb[:, 0]
            cand_lanes = new_inds_b & ~slices & ~skip_wb[:, None]
            sel = jax.vmap(
                lambda k, cl, sw: saf._pick_rescue_slices(
                    k, cl, cfg.max_new_slices, sw, max_width, log2d_flat,
                    w),
                in_axes=(0, 1, 0), out_axes=1)(k_slices, cand_lanes,
                                               new_sliced_width_b)
            cand_slices = slices | sel
            rescued_width = wfn(new_inds_b & ~cand_slices)
            can_rescue = (~fits) & (rescued_width <=
                                    max_width + _WIDTH_EPS)

            # Proposed tree per lane (children c<->e swapped in rows a, b)
            c_b2 = jnp.broadcast_to(c[None, :], c0.shape)
            e_b2 = jnp.broadcast_to(e[None, :], c0.shape)
            upd_all = m_a | m_b
            c0_try = jnp.where(upd_all & (c0 == c_b2), e_b2,
                               jnp.where(upd_all & (c0 == e_b2), c_b2, c0))
            c1_try = jnp.where(upd_all & (c1 == c_b2), e_b2,
                               jnp.where(upd_all & (c1 == e_b2), c_b2, c1))
            inds_try = jnp.where(m_b[:, None, :], new_inds_b[None], inds)
            nodes_try = jnp.stack([c0_try, c1_try, par], axis=1)
            lcc_try = jax.vmap(
                lambda nd, xi, sl: saf.compute_lcc_fw(
                    nd, xi, sl, log2d_flat, sparse_flat, log2_n_projs),
                in_axes=(2, 2, 1), out_axes=1)(nodes_try, inds_try,
                                               cand_slices)
            lt_try = _log2_total_b(lcc_try, n_leaves)
            u2 = unif(k_u2)
            ok = active & can_rescue & accept_fn(jnp.log2(u2), lt_try, lt)
            rescued = ok
            slices = jnp.where(ok[None, :], cand_slices, slices)
            l_new = jnp.where(ok, lt_try, l_new)
            accept = accept | ok
        else:
            del k_slices, k_u2

        acc = accept[None, :]

        c_bcast = jnp.broadcast_to(c[None, :], c0.shape)
        e_bcast = jnp.broadcast_to(e[None, :], c0.shape)
        upd = acc & (m_a | m_b)
        c0 = jnp.where(upd & (c0 == c_bcast), e_bcast,
                       jnp.where(upd & (c0 == e_bcast), c_bcast, c0))
        c1 = jnp.where(upd & (c1 == c_bcast), e_bcast,
                       jnp.where(upd & (c1 == e_bcast), c_bcast, c1))
        par = jnp.where(acc & m_c,
                        jnp.broadcast_to(bq[None, :], par.shape),
                        jnp.where(acc & m_e,
                                  jnp.broadcast_to(a[None, :], par.shape),
                                  par))

        accw = acc[:, None, :]
        inds = jnp.where(accw & m_b[:, None, :], new_inds_b[None], inds)
        if cfg.max_new_slices > 0:
            lcc = jnp.where(rescued[None, :], lcc_try, lcc)
            inc = (accept & ~rescued)[None, :]
            lcc = jnp.where(inc & m_a, ln_a[None, :],
                            jnp.where(inc & m_b, ln_b[None, :], lcc))
        else:
            lcc = jnp.where(acc & m_a, ln_a[None, :],
                            jnp.where(acc & m_b, ln_b[None, :], lcc))
        width = jnp.where(acc & m_b, new_width_b[None, :], width)
        lt = jnp.where(accept, l_new, lt)

        pos_b = jnp.where(active, a, pos_b)
        keys = jnp.where(
            active.reshape(active.shape + (1,) * (keys.ndim - 1)),
            keys_new, keys)
        moves = moves + jnp.sum(active, dtype=jnp.int32)

        par_next = grow_i(par, row_mask(pos_b))
        next_active = active & (pos_b != -1) & (par_next != -1)
        return (c0, c1, par, inds, lcc, width, slices, lt, pos_b,
                keys, moves, next_active)

    par_b0 = grow_i(par, row_mask(pos_b0))
    active0 = (pos_b0 != -1) & (par_b0 != -1)
    cy = (c0, c1, par, inds, lcc, width, slices, lt0, pos_b0, keys,
          jnp.int32(0), active0)
    (c0, c1, par, inds, lcc, width, slices, _, _, keys, moves,
     _) = jax.lax.while_loop(cond, body, cy)

    # Post-sweep reslice-if-better (mirrors sa_finite: one key per sweep)
    keys, k_reslice = split2(keys)

    def do_reslice(args):
        c0_, inds_, width_, slices_, lcc_ = args
        new_slices = _greedy_slices_b(c0_, inds_, width_, k_reslice,
                                      max_width, log2d_w32, skip_wb,
                                      sparse_wb, log2_n_projs,
                                      uniform_log2=uniform_log2)
        new_lcc = _lcc_fw_b(c0_, c1, inds_, new_slices, log2d_w32,
                            sparse_wb, log2_n_projs,
                            uniform_log2=uniform_log2)
        better = (_log2_total_b(new_lcc, n_leaves) <
                  _log2_total_b(lcc_, n_leaves))
        bet_w = better[None, None, :] if new_slices.ndim == 3 else \
            better[None, :]
        return (jnp.where(bet_w, new_slices, slices_),
                jnp.where(better[None, :], new_lcc, lcc_))

    def skip_reslice(args):
        *_, slices_, lcc_ = args
        return slices_, lcc_

    has_slices = jnp.any(slices != 0)
    slices, lcc = jax.lax.cond(update_slices & has_slices, do_reslice,
                               skip_reslice,
                               (c0, inds, width, slices, lcc))

    lt_final = _log2_total_b(lcc, n_leaves)
    improved = lt_final < min_lt
    impn = improved[None, :]
    impw = improved[None, None, :]
    min_lt = jnp.where(improved, lt_final, min_lt)
    min_c0 = jnp.where(impn, c0, min_c0)
    min_c1 = jnp.where(impn, c1, min_c1)
    min_par = jnp.where(impn, par, min_par)
    min_inds = jnp.where(impw, inds, min_inds)
    min_slices = jnp.where(impn, slices, min_slices)

    return ((c0, c1, par, inds, lcc, width, slices, lt_final,
             min_lt, min_c0, min_c1, min_par, min_inds, min_slices, keys),
            moves)


def _run_fw(batch: SABatchFW, betas, update_slices_mask, max_width,
            log2d_w32, skip_wb, cfg: SweepConfigFW, sparse_wb=None,
            log2_n_projs=None, uniform_log2=None):
    n = batch.c0.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]
    max_width = jnp.asarray(max_width, log2d_w32.dtype)

    def step(carry, x):
        beta, upd = x
        carry, moves = _sweep_fw_batched(carry, beta, upd, max_width,
                                         log2d_w32, skip_wb, cfg, iota_n,
                                         sparse_wb, log2_n_projs,
                                         uniform_log2)
        return carry, (carry[7], carry[8], moves)

    carry = (batch.c0, batch.c1, batch.par, batch.inds,
             batch.lcc, batch.width, batch.slices, batch.log2_total,
             batch.min_log2_total, batch.min_c0, batch.min_c1,
             batch.min_par, batch.min_inds, batch.min_slices, batch.keys)
    carry, (lt_hist, min_hist, moves_hist) = jax.lax.scan(
        step, carry, (betas, update_slices_mask))
    (c0, c1, par, inds, lcc, width, slices, lt, min_lt, min_c0, min_c1,
     min_par, min_inds, min_slices, keys) = carry
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatchFW(c0, c1, par, inds, hyper, lcc, width, slices, lt,
                    min_lt, min_c0, min_c1, min_par, min_inds, min_slices,
                    keys)
    return out, {'log2_total': lt_hist, 'log2_min_total': min_hist,
                 'moves': moves_hist}


run_sweeps_fw_batched = fts.partial(
    jax.jit, static_argnames=('cfg', 'uniform_log2'))(_run_fw)


def init_batch_fw(ctrees, seeds, max_width, log2_dims_padded, *,
                  skip_lanes=None, sparse_lanes=None, log2_n_projs=None,
                  dtype=np.float32) -> SABatchFW:
    """Builds a replica-minor finite-width batch entirely on host.

    One device upload for the whole batch: per-replica device dispatches
    (the old path: ~1s/replica over a tunneled TPU) become numpy work,
    with initial slices from the host greedy slicer
    (:func:`tnco_tpu.kernels.sa_finite.greedy_slices_host` — same
    ranking as the device slicer, host jitter).
    """
    from random import Random

    from tnco_tpu.kernels import sa_finite as saf

    n = len(ctrees[0])
    b = len(ctrees)
    w = ctrees[0].inds_array.shape[1]
    n_leaves = ctrees[0].n_leaves
    log2d = np.asarray(log2_dims_padded, dtype=np.float64)
    mw = float(max_width)

    c0 = np.empty((n, b), dtype=np.int32)
    c1 = np.empty((n, b), dtype=np.int32)
    par = np.empty((n, b), dtype=np.int32)
    inds = np.empty((n, w, b), dtype=np.uint32)
    for i, ctree in enumerate(ctrees):
        nodes = ctree.nodes_array
        c0[:, i] = nodes[:, 0]
        c1[:, i] = nodes[:, 1]
        par[:, i] = nodes[:, 2]
        inds[:, :, i] = ctree.inds_array

    shifts = np.arange(32, dtype=np.uint32)

    def expand(lanes):  # [..., w] -> bool [..., w*32]
        bits = (lanes[..., :, None] >> shifts) & 1
        return bits.astype(bool).reshape(*lanes.shape[:-1], w * 32)

    skip_bits = None if skip_lanes is None else \
        expand(np.asarray(skip_lanes, dtype=np.uint32))
    sparse_np = None if sparse_lanes is None else \
        np.asarray(sparse_lanes, dtype=np.uint32)
    sparse_bits = None if sparse_np is None else expand(sparse_np)

    def width_of(bits):  # bool [..., n_bits] -> float
        if sparse_bits is None:
            return bits @ log2d
        return ((bits & ~sparse_bits) @ log2d +
                np.minimum((bits & sparse_bits) @ log2d,
                           float(log2_n_projs)))

    slices = np.empty((w, b), dtype=np.uint32)
    for i in range(b):
        slices[:, i] = saf.greedy_slices_host(
            inds[:, :, i], log2d, mw, Random(int(seeds[i]) & 0x7FFFFFFF),
            skip_bits=skip_bits, sparse_bits=sparse_bits,
            log2_n_projs=log2_n_projs)

    internal = c0 >= 0
    c0s = np.where(internal, c0, 0)
    c1s = np.where(internal, c1, 0)
    gather = np.take_along_axis
    inds_c0 = gather(inds, c0s[:, None, :], axis=0)
    inds_c1 = gather(inds, c1s[:, None, :], axis=0)
    hyper = np.where(internal[:, None, :], inds & inds_c0 & inds_c1,
                     np.uint32(0))

    # [n, b, n_bits] bool is too big for huge nets; do it per replica.
    lcc = np.empty((n, b), dtype=np.float64)
    width = np.empty((n, b), dtype=np.float64)
    for i in range(b):
        union = expand(inds_c0[:, :, i] | inds_c1[:, :, i] |
                       slices[None, :, i])
        lcc[:, i] = width_of(union)
        width[:, i] = width_of(expand(inds[:, :, i]))
    lcc = np.where(internal, lcc, -np.inf).astype(dtype)
    width = width.astype(dtype)

    internal_lcc = lcc[n_leaves:]
    if internal_lcc.shape[0]:
        m = internal_lcc.max(axis=0)
        lt = (m + np.log2(np.exp2(internal_lcc - m[None, :]).sum(axis=0))
              ).astype(dtype)
    else:
        lt = np.full(b, -np.inf, dtype=dtype)

    # Keys: PRNGKey(seed) split once (slicer key consumed), matching the
    # device init's key discipline — batched in a single dispatch.
    seeds_arr = np.asarray([int(s) & 0xFFFFFFFF for s in seeds],
                           dtype=np.uint32)
    keys0 = jnp.stack([jnp.zeros_like(jnp.asarray(seeds_arr)),
                       jnp.asarray(seeds_arr)], axis=1)
    keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys0)

    return SABatchFW(jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(par),
                     jnp.asarray(inds), jnp.asarray(hyper),
                     jnp.asarray(lcc), jnp.asarray(width),
                     jnp.asarray(slices), jnp.asarray(lt), jnp.asarray(lt),
                     jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(par),
                     jnp.asarray(inds), jnp.asarray(slices), keys)
