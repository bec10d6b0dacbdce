"""Chained multi-walk SA engine on the pull/gather machinery (v3).

Why this engine exists: the equal-proposal probes on width-capped
Sycamore showed the synchronous full-tree engine structurally stalls
~15 bits above the sequential arms (native 72.6 vs sweep 87.2 at 2e5
proposals/replica) — deep trees need *chained* bottom-up move
sequences (a subtree riding up the tree across consecutive accepted
uncle swaps along a leaf-to-root walk), which ~N/2 independent
single-rotation proposals per round cannot compose.  The masked
multi-walk engine (:mod:`tnco_tpu.kernels.sa_multiwalk`) has exactly
the right chained semantics but pays O(N·W) masked-reduction traffic
per walk; this engine keeps those semantics and replaces every row
access with the fullsweep v2 primitives:

- state packed as ``uint32 [F, B, N_pad]`` planes with nodes on LANES
  (``[inds(0:W), c0, c1, lcc(, width), par]``; N padded to 128 with
  inert rows so the kernels' pads are no-ops inside the scan);
- every irregular row read is a lane-wise plane-RANGE
  :func:`tnco_tpu.kernels.pallas_gather.gather_gbn` at the ``[B, P]``
  walk positions (scalar rows at B, scalar rows at A, then ONE
  index-plane gather at the five ids {B, A, C, c0(B), c1(B)}) — the
  scalar phases stream only a handful of planes, and the W index
  planes stream exactly once;
- the apply step writes the 4 touched rows per kept walk with TWO
  plane-range calls of the dual
  :func:`tnco_tpu.kernels.pallas_scatter.scatter_rows_inplace` (an id
  inversion shared across planes + lane-wise dynamic_gather from the
  update buffer, writing the aliased state in place) — no masked
  O(N·P) passes, no XLA scalar-loop scatters, no caller-side copies.

Per-iteration cost is dominated by streaming the state planes a fixed
number of times, independent of the walk count ``P`` — so ``P`` scales
proposal throughput until tree-neighborhood conflicts bite.

Semantics: identical to :mod:`tnco_tpu.kernels.sa_multiwalk` (same
proposal geometry, same acceptance, same PRNG stream, same additive
float updates) up to the conflict filter.  ``claim='sequential'``
(the default) reproduces the multi-walk engine's lower-index-wins
scan and is BIT-IDENTICAL to it (enforced by tests);
``claim='pairwise'`` blocks a walk on conflict with any lower-index
*accepted* walk — one fused O(P^2·B) pass instead of a P-step serial
loop, but transitively more conservative: near the root (where every
walk's path converges) it blocks restructuring moves the sequential
scan lets through, which measurably degrades deep-network quality at
equal iterations (CPU probe: 88.6 vs ~81 on width-capped Sycamore at
7000 iterations, P=8).  Kept proposals are pairwise disjoint either
way, so the simultaneous application equals a sequential order.

Reference semantics per proposal: include/tnco/optimize/
infinite_memory/optimizer.hpp:117-192 (and finite_width/greedy/
optimizer.hpp:188-225 for the width-capped variant); the synchronous
multi-walk scheduling and the conflict filters are original TPU-first
scheduling.
"""

import functools as fts

import jax
import jax.numpy as jnp

from tnco_tpu.kernels.pallas_gather import gather_gbn
from tnco_tpu.kernels.pallas_scatter import scatter_rows_inplace
# Shared plane codecs + the order-pinned width machinery (fullsweep v2).
from tnco_tpu.kernels.sa_fullsweep import (_i32, _join_f, _nk, _split_f,
                                           _u32, _width_bn)
from tnco_tpu.kernels.sa_batched import SABatch, compute_hyper_b
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.kernels.sa_multiwalk import _chains_lt, _draws
from tnco_tpu.ops import costs as costs_ops

__all__ = ['run_walks', 'run_walks_fw', 'run_walks_sharded']

NULL = -1
_SCALED_FLOOR = 2.0**-60


def _n_pad(n: int) -> int:
    """State lane padding: multiples of 128 keep the Pallas gather and
    scatter pads no-ops inside the scan (a nonzero pad there copies the
    full state every call)."""
    return -(-n // 128) * 128


def _pack_w(c0, c1, par, inds, lcc, width=None):
    """``[N, B]`` / ``[N, W, B]`` arrays -> ``u32 [F, B, N_pad]``.

    Plane layout (walks engine): ``[0:W)`` inds; c0; c1; lcc (nk);
    optionally the FW pre-slicing width (nk); par LAST — so the merged
    apply scatter (inds+c0+c1+lcc(+width) at the {B, A} ids) and the
    par scatter (at the {C, E} ids) are both contiguous plane ranges.

    The node axis is padded to a multiple of 128 with INERT rows:
    children/parent NULL (never reached by any walk), inds 0 and lcc
    -inf (an exact zero contribution to the order-pinned total, so
    padded and unpadded engines produce bit-identical costs).
    """
    n = c0.shape[0]
    pad = _n_pad(n) - n
    if pad:
        nullp = jnp.full((pad,) + c0.shape[1:], NULL, c0.dtype)
        c0 = jnp.concatenate([c0, nullp], axis=0)
        c1 = jnp.concatenate([c1, nullp], axis=0)
        par = jnp.concatenate([par, nullp], axis=0)
        inds = jnp.concatenate(
            [inds, jnp.zeros((pad,) + inds.shape[1:], inds.dtype)],
            axis=0)
        lcc = jnp.concatenate(
            [lcc, jnp.full((pad,) + lcc.shape[1:], -jnp.inf, lcc.dtype)],
            axis=0)
        if width is not None:
            width = jnp.concatenate(
                [width,
                 jnp.zeros((pad,) + width.shape[1:], width.dtype)],
                axis=0)
    planes = [jnp.transpose(inds, (1, 2, 0))]
    planes.append(_u32(c0.T)[None])
    planes.append(_u32(c1.T)[None])
    planes.append(_split_f(lcc.T))
    if width is not None:
        planes.append(_split_f(width.T))
    planes.append(_u32(par.T)[None])
    return jnp.concatenate(planes, axis=0)


def _par_plane(w, nk, fw, u=0):
    """``u`` is the union-plane count (``w`` when the FW fast-reslice
    path maintains U = inds[c0]|inds[c1] planes between the index
    planes and c0, else 0)."""
    return w + u + 2 + nk + (nk if fw else 0)


def _unpack_w(S, w, dtype, n, fw=False, u=0):
    nk = _nk(dtype)
    inds = jnp.transpose(S[:w, :, :n], (2, 0, 1))           # [N, W, B]
    c0 = _i32(S[w + u, :, :n]).T
    c1 = _i32(S[w + u + 1, :, :n]).T
    lcc = _join_f(S[w + u + 2:w + u + 2 + nk, :, :n], dtype).T
    par = _i32(S[_par_plane(w, nk, fw, u), :, :n]).T
    if not fw:
        return c0, c1, par, inds, lcc
    width = _join_f(S[w + u + 2 + nk:w + u + 2 + 2 * nk, :, :n],
                    dtype).T
    return c0, c1, par, inds, lcc, width


def _lt_from_S(S, w, nk, nl, dtype, u=0):
    lcc_bn = _join_f(S[w + u + 2:w + u + 2 + nk], dtype)    # [B, N]
    # Last-axis pinned total: value-identical to the transposed form
    # (same element pairing, see costs.log2_total_from_lcc_last) at
    # ~0.3 ms/iteration less on Sycamore shapes.
    return costs_ops.log2_total_from_lcc_last(lcc_bn, nl)


def _propose_walks(S, pos, leaf, rand_bit, cfg: SweepConfig, log2d_w32,
                   uniform_log2, dtype, sparse_w, log2_n_projs,
                   interpret, slices_wb=None, with_width=False, u=0):
    """Row pulls + proposal math at the ``[B, P]`` walk positions.

    Three dependent pull phases, each a plane-RANGE gather over the
    shared state (no caller-side plane slices, so nothing beyond the
    pulled planes is ever copied): scalar rows at B (c0, c1, lcc,
    width?, par -> A), scalar rows at A, then ONE index-plane gather at
    the five ids {B, A, C, c0(B), c1(B)}.

    Returns the advanced positions and the per-walk ``ev`` dict
    (ids/costs ``[B, P]``, lane sets ``[W, B, P]``).
    """
    w = cfg.n_lanes
    nk = _nk(dtype)
    p = pos.shape[1]
    par_plane = _par_plane(w, nk, with_width, u)

    # Restart finished walks at the parent of a fresh leaf (multiwalk
    # semantics: a walk at the root, or never started, restarts).
    ids0 = jnp.concatenate([jnp.maximum(pos, 0), leaf], axis=1)
    pp = _i32(gather_gbn(S, ids0, interpret=interpret,
                         planes=(par_plane, par_plane + 1))[0])
    par_pos, par_leaf = pp[:, :p], pp[:, p:]
    at_boundary = (pos == NULL) | (par_pos == NULL)
    pos = jnp.where(at_boundary, par_leaf, pos)

    b = pos
    rb = gather_gbn(S, b, interpret=interpret,
                    planes=(w + u, par_plane + 1))
    c0b = _i32(rb[0])
    c1b = _i32(rb[1])
    l_b = _join_f(rb[2:2 + nk], dtype)
    a = _i32(rb[-1])
    a = jnp.where(b == NULL, NULL, a)
    ev = dict(a=a, b=b, c0b=c0b, c1b=c1b, l_b=l_b)
    if with_width:
        ev['w_b'] = _join_f(rb[2 + nk:2 + 2 * nk], dtype)

    ra = gather_gbn(S, a, interpret=interpret,
                    planes=(w + u, par_plane))
    c0a = _i32(ra[0])
    c1a = _i32(ra[1])
    ev['l_a'] = _join_f(ra[2:2 + nk], dtype)
    if with_width:
        ev['w_a'] = _join_f(ra[2 + nk:2 + 2 * nk], dtype)
    c = jnp.where(c0a == b, c1a, c0a)
    ev.update(c=c, c0a=c0a, c1a=c1a)

    r5 = gather_gbn(S, jnp.concatenate([b, a, c, c0b, c1b], axis=1),
                    interpret=interpret, planes=(0, w))
    inds_b = r5[:, :, :p]
    inds_a = r5[:, :, p:2 * p]
    inds_c = r5[:, :, 2 * p:3 * p]
    inds0 = r5[:, :, 3 * p:4 * p]
    inds1 = r5[:, :, 4 * p:]
    ev['inds_b'] = inds_b
    ev['inds_a'] = inds_a

    i0 = jnp.any((inds0 & inds_c) != 0, axis=0)
    i1 = jnp.any((inds1 & inds_c) != 0, axis=0)
    take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1), rand_bit, i0)
    ev['d'] = jnp.where(take0, c0b, c1b)
    ev['e'] = jnp.where(take0, c1b, c0b)
    t0 = take0[None]
    inds_d = jnp.where(t0, inds0, inds1)
    inds_e = jnp.where(t0, inds1, inds0)
    if with_width:
        # The FW apply maintains the union planes (U = child-row OR)
        # from these: U[B] = inds_d | inds_c, U[A] = new_inds_b | inds_e.
        ev['inds_c'] = inds_c
        ev['inds_d'] = inds_d

    hyp_a = inds_a & inds_b & inds_c
    hyp_b = inds_b & inds0 & inds1
    ev['new_inds_b'] = (inds_d ^ inds_c) | hyp_a | hyp_b

    def width(lanes):
        if slices_wb is not None:
            lanes = lanes | slices_wb[:, :, None]
        return _width_bn(lanes, log2d_w32, uniform_log2, dtype,
                         sparse_w=sparse_w, log2_n_projs=log2_n_projs)

    ev['ln_b'] = width(inds_d | inds_c)
    ev['ln_a'] = width(ev['new_inds_b'] | inds_e)
    ev['inds_e'] = inds_e
    return pos, ev


def _accept_walks(ev, lt, u, beta, cfg: SweepConfig):
    # beta: scalar (one temperature per iteration) or [B] (per-lane
    # ladder — parallel tempering); identical ops for the scalar case.
    beta = jnp.asarray(beta)
    if beta.ndim:
        beta = beta[:, None]
    if cfg.prob_kind == 'mh':
        l_new = costs_ops.new_total_log2(lt[:, None], ev['l_a'],
                                         ev['l_b'], ev['ln_a'],
                                         ev['ln_b'])
        accept = jnp.log2(u) <= -beta * (l_new - lt[:, None])
    elif cfg.prob_kind == 'mh_local':
        # Pair-calibrated Metropolis (see sa_fullsweep._accept): anneals
        # every cost scale of the tree simultaneously.
        m = jnp.maximum(jnp.maximum(ev['l_a'], ev['l_b']),
                        jnp.maximum(ev['ln_a'], ev['ln_b']))
        old = jnp.exp2(ev['l_a'] - m) + jnp.exp2(ev['l_b'] - m)
        new = jnp.exp2(ev['ln_a'] - m) + jnp.exp2(ev['ln_b'] - m)
        delta = (jnp.log2(jnp.maximum(new, _SCALED_FLOOR)) -
                 jnp.log2(jnp.maximum(old, _SCALED_FLOOR)))
        accept = jnp.log2(u) <= -beta * delta
    elif cfg.prob_kind == 'greedy':
        l_new = costs_ops.new_total_log2(lt[:, None], ev['l_a'],
                                         ev['l_b'], ev['ln_a'],
                                         ev['ln_b'])
        accept = l_new <= lt[:, None]
    else:
        accept = jnp.ones_like(ev['l_a'], dtype=bool)
    return accept & (ev['b'] != NULL) & (ev['a'] != NULL)


def _claim_pairwise(accept, ev):
    """Lower walk index wins against every lower-index ACCEPTED walk
    (one fused O(P^2·B) pass; slightly more conservative than the
    sequential scan but still yields pairwise-disjoint kept sets)."""
    nodes5 = jnp.stack([ev[k] for k in ('a', 'b', 'c', 'd', 'e')])
    x = nodes5[:, None, :, :, None]
    y = nodes5[None, :, :, None, :]
    confl = jnp.any(x == y, axis=(0, 1))                    # [B, P, P]
    p = accept.shape[-1]
    lower = jnp.arange(p)[None, :] < jnp.arange(p)[:, None]  # q < p
    blocked = jnp.any(confl & accept[:, None, :] & lower[None], axis=-1)
    return accept & ~blocked


_CLAIM_BLOCK = 16


def _advance_walks(pos_a, accept, keep, on_block):
    """``[B, P]`` adapter of :func:`sa_multiwalk._advance_walks` (walk
    scheduling after claims — 'advance' | 'restart' | 'dedup'; see the
    shared implementation for semantics).  Transposes are value-exact,
    so the two engines stay bit-identical under every option."""
    from tnco_tpu.kernels.sa_multiwalk import _advance_walks as _adv_pb
    if on_block == 'advance':
        return pos_a
    return _adv_pb(pos_a.T, accept.T, keep.T, on_block).T


def _claim_sequential(accept, ev):
    """The multi-walk engine's claim scan (lower index wins against
    lower-index KEPT walks) in the ``[B, P]`` layout — bit-identical
    kept sets to ``sa_multiwalk._claim_disjoint``.

    The naive form is a P-step ``fori_loop`` re-deriving each walk's
    conflict row from the 5 node ids per step — P sequential kernel
    dispatches.  Here the symmetric conflict matrix
    ``M[b, p, q] = any_{k,l} nodes5[k,b,p] == nodes5[l,b,q]`` is built
    ONCE (25 fused [B,P,P] compares), and the scan runs over blocks of
    ``_CLAIM_BLOCK`` walks: the cross-block test is one masked
    [B, K, P] reduction against already-kept walks, and the within-
    block dependency chain is unrolled at trace time on the [B, K, K]
    tile — the same comparisons in the same order as the naive scan
    (boolean logic, so bit-identical kept sets), at P/K sequential
    steps instead of P.  Measured on Sycamore (N=3241) at B=64/P=128:
    IM 4.16e6 vs 3.59e6 proposals/s (1.97 vs 2.28 ms/iter, +16%); FW
    is a wash (3.19 vs 3.15 ms/iter — the FW iteration is dominated
    by the width/slice machinery, not the claim scan)."""
    nodes5 = jnp.stack([ev[k] for k in ('a', 'b', 'c', 'd', 'e')])
    b, p = accept.shape
    confl = jnp.zeros((b, p, p), bool)
    for k in range(5):
        for l in range(5):
            confl = confl | (nodes5[k][:, :, None] ==
                             nodes5[l][:, None, :])

    kblk = _CLAIM_BLOCK
    while p % kblk:
        kblk //= 2

    def claim_block(nb, keep):
        off = nb * kblk
        mb = jax.lax.dynamic_slice_in_dim(confl, off, kblk, axis=1)
        mbb = jax.lax.dynamic_slice_in_dim(mb, off, kblk, axis=2)
        ab = jax.lax.dynamic_slice_in_dim(accept, off, kblk, axis=1)
        # keep has zeros throughout this block until the write below,
        # so the cross-block reduction only sees lower-index kept walks.
        blocked0 = jnp.any(keep[:, None, :] & mb, axis=2)   # [B, K]
        cols = []
        for i in range(kblk):
            blk = blocked0[:, i]
            for j in range(i):
                blk = blk | (cols[j] & mbb[:, i, j])
            cols.append(ab[:, i] & ~blk)
        return jax.lax.dynamic_update_slice_in_dim(
            keep, jnp.stack(cols, axis=1), off, axis=1)

    return jax.lax.fori_loop(0, p // kblk, claim_block,
                             jnp.zeros_like(accept))


def _claim_sequential_chained(cfg, u, beta, lt, valid, ev):
    """Chained-acceptance claim scan in the ``[B, P]`` layout.

    Same semantics as :func:`sa_multiwalk._claim_chained` (walk i's
    Metropolis test runs against the running total of kept walks < i —
    a round becomes an exact sequential Metropolis chain) with the
    blocked structure of :func:`_claim_sequential`: the conflict matrix
    is built once, the cross-block blocked test is one masked
    reduction, and the within-block chain is unrolled at trace time.
    The per-walk float step is the SHARED
    :func:`sa_multiwalk._chained_accept_step`, so kept sets and the
    ``lt_run`` sequence are bit-identical to the masked engine's scan.

    Returns ``(accept, keep)`` ([B, P])."""
    from tnco_tpu.kernels.sa_multiwalk import _chained_accept_step

    nodes5 = jnp.stack([ev[k] for k in ('a', 'b', 'c', 'd', 'e')])
    b, p = valid.shape
    confl = jnp.zeros((b, p, p), bool)
    for k in range(5):
        for l in range(5):
            confl = confl | (nodes5[k][:, :, None] ==
                             nodes5[l][:, None, :])

    kblk = _CLAIM_BLOCK
    while p % kblk:
        kblk //= 2

    beta_b = jnp.asarray(beta)  # scalar or [B] (tempering ladder)

    def claim_block(nb, carry):
        keep, accept, lt_run = carry
        off = nb * kblk
        mb = jax.lax.dynamic_slice_in_dim(confl, off, kblk, axis=1)
        mbb = jax.lax.dynamic_slice_in_dim(mb, off, kblk, axis=2)

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, off, kblk, axis=1)

        vb, ub = sl(valid), sl(u)
        la, lb_ = sl(ev['l_a']), sl(ev['l_b'])
        lna, lnb = sl(ev['ln_a']), sl(ev['ln_b'])
        blocked0 = jnp.any(keep[:, None, :] & mb, axis=2)   # [B, K]
        cols, acc_cols = [], []
        for i in range(kblk):
            blk = blocked0[:, i]
            for j in range(i):
                blk = blk | (cols[j] & mbb[:, i, j])
            acc, l_new = _chained_accept_step(
                cfg, lt_run, beta_b, ub[:, i], la[:, i], lb_[:, i],
                lna[:, i], lnb[:, i])
            acc = acc & vb[:, i]
            kp = acc & ~blk
            lt_run = jnp.where(kp, l_new, lt_run)
            cols.append(kp)
            acc_cols.append(acc)
        keep = jax.lax.dynamic_update_slice_in_dim(
            keep, jnp.stack(cols, axis=1), off, axis=1)
        accept = jax.lax.dynamic_update_slice_in_dim(
            accept, jnp.stack(acc_cols, axis=1), off, axis=1)
        return keep, accept, lt_run

    zeros = jnp.zeros_like(valid)
    keep, accept, _ = jax.lax.fori_loop(0, p // kblk, claim_block,
                                        (zeros, zeros, lt))
    return accept, keep


def _apply_walks(S, ev, kept, cfg: SweepConfig, dtype, interpret,
                 with_width=False, u=0):
    """Scatter the 4 touched rows of every kept walk.

    TWO plane-range scatter calls: the merged group (inds, the FW
    union planes, c0, c1, lcc and the FW width) at the {B, A} ids —
    the A rows rewrite their own unchanged index sets/widths, which is
    free since the planes stream anyway and keeps the call count
    minimal — and the par plane at the {C, E} ids.  Float rows are
    written in the multi-walk engine's ADDITIVE form
    (``old + (new - old)``) so trajectories stay bit-identical to it.

    ``u``: union-plane count.  U[i] = inds[c0[i]] | inds[c1[i]] sits
    between the index planes and c0 so it joins the merged {B, A}
    scatter: only the B and A rows change — B's new children are
    {D, C}, A's are {B(new), E} — and everything needed is already in
    ``ev``, so the reslice never has to re-gather child rows.
    """
    w = cfg.n_lanes
    nk = _nk(dtype)
    par_plane = _par_plane(w, nk, with_width, u)

    def masked(ids):
        return jnp.where(kept, ids, NULL)

    b_k, a_k = masked(ev['b']), masked(ev['a'])
    c_k, e_k = masked(ev['c']), masked(ev['e'])

    new_c0b = jnp.where(ev['c0b'] == ev['e'], ev['c'], ev['c0b'])
    new_c1b = jnp.where(ev['c1b'] == ev['e'], ev['c'], ev['c1b'])
    new_c0a = jnp.where(ev['c0a'] == ev['c'], ev['e'], ev['c0a'])
    new_c1a = jnp.where(ev['c1a'] == ev['c'], ev['e'], ev['c1a'])
    new_l_b = ev['l_b'] + (ev['ln_b'] - ev['l_b'])
    new_l_a = ev['l_a'] + (ev['ln_a'] - ev['l_a'])

    # Merged group: inds (+ union) + c0 + c1 + lcc (+ width) at {B, A}.
    ids_ba = jnp.concatenate([b_k, a_k], axis=1)
    planes1 = [
        jnp.concatenate([ev['new_inds_b'], ev['inds_a']], axis=2),
    ]
    if u:
        planes1.append(jnp.concatenate(
            [ev['inds_d'] | ev['inds_c'],
             ev['new_inds_b'] | ev['inds_e']], axis=2))
    planes1 += [
        _u32(jnp.concatenate([new_c0b, new_c0a], axis=1))[None],
        _u32(jnp.concatenate([new_c1b, new_c1a], axis=1))[None],
        _split_f(jnp.concatenate([new_l_b, new_l_a], axis=1)),
    ]
    if with_width:
        new_w_b = ev['w_b'] + (ev['new_width_b'] - ev['w_b'])
        planes1.append(
            _split_f(jnp.concatenate([new_w_b, ev['w_a']], axis=1)))
    upd1 = jnp.concatenate(planes1, axis=0)
    S = scatter_rows_inplace(S, ids_ba, upd1, interpret=interpret,
                             planes=(0, par_plane))

    # par at {C, E} (C reparents to B, E to A).
    ids_ce = jnp.concatenate([c_k, e_k], axis=1)
    upd2 = _u32(jnp.concatenate([ev['b'], ev['a']], axis=1))[None]
    S = scatter_rows_inplace(S, ids_ce, upd2, interpret=interpret,
                             planes=(par_plane, par_plane + 1))
    return S


def _iter_walks(carry, beta, log2d_w32, cfg: SweepConfig, claim,
                on_block, accept_rule, uniform_log2, sparse_w,
                log2_n_projs, interpret):
    (S, lt, S_min, min_lt, keys, pos, moves, applied) = carry
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    p = pos.shape[1]

    keys, leaf, rand_bit, u, _ = _draws(keys, nl, p, dtype, 4)
    leaf, rand_bit, u = leaf.T, rand_bit.T, u.T             # [B, P]

    # ``lt`` rides in the carry: it is the pinned total of S as left by
    # the previous iteration — the exact value the old entry recompute
    # produced (bitwise; same computation at the same program point).
    pos, ev = _propose_walks(S, pos, leaf, rand_bit, cfg, log2d_w32,
                             uniform_log2, dtype, sparse_w,
                             log2_n_projs, interpret)
    if accept_rule == 'chained' and _chains_lt(cfg):
        valid = (ev['b'] != NULL) & (ev['a'] != NULL)
        accept, keep = _claim_sequential_chained(cfg, u, beta, lt,
                                                 valid, ev)
    else:
        accept = _accept_walks(ev, lt, u, beta, cfg)
        keep = (_claim_sequential if claim == 'sequential' else
                _claim_pairwise)(accept, ev)
    S = _apply_walks(S, ev, keep, cfg, dtype, interpret)

    pos = _advance_walks(ev['a'], accept, keep, on_block)
    moves = moves + jnp.int32(p * pos.shape[0])
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    lt_new = _lt_from_S(S, w, nk, nl, dtype)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)
    S_min = jax.lax.cond(
        jnp.any(improved),
        lambda args: jnp.where(improved[None, :, None], *args),
        lambda args: args[1], (S, S_min))
    return (S, lt_new, S_min, min_lt, keys, pos, moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'claim', 'on_block',
                                       'accept_rule', 'uniform_log2',
                                       'interpret'))
def run_walks(batch: SABatch, betas, log2d_w32, cfg: SweepConfig, pos,
              sparse_wb=None, log2_n_projs=None, *,
              claim='sequential', on_block='advance',
              accept_rule='round', uniform_log2=None,
              interpret=None):
    """One chained multi-walk iteration per beta (P proposals per
    replica per iteration; P is ``pos.shape[0]``).

    ``pos`` is ``int32 [P, B]`` (-1 = start a fresh walk), as in the
    masked multi-walk engine; returns the updated batch and
    ``{'moves', 'applied', 'pos'}``.
    """
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    sparse_w = None if sparse_wb is None else \
        jnp.asarray(sparse_wb).reshape(-1)

    S = _pack_w(batch.c0, batch.c1, batch.par, batch.inds, batch.lcc)
    S_min = _pack_w(batch.min_c0, batch.min_c1, batch.min_par,
                    batch.min_inds, batch.lcc)

    def step(carry, beta):
        return _iter_walks(carry, beta, log2d_w32, cfg, claim,
                           on_block, accept_rule, uniform_log2,
                           sparse_w, log2_n_projs, interpret), None

    carry = (S, _lt_from_S(S, w, nk, nl, dtype), S_min,
             batch.min_log2_total, batch.keys, pos.T,
             jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, betas)
    (S, lt, S_min, min_lt, keys, pos_bp, moves, applied) = carry

    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    S_min = jnp.where(improved[None, :, None], S, S_min)
    n = batch.c0.shape[0]
    c0, c1, par, inds, lcc = _unpack_w(S, w, dtype, n)
    mc0, mc1, mpar, minds, _ml = _unpack_w(S_min, w, dtype, n)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt, mc0, mc1,
                  mpar, minds, keys)
    return out, {'moves': moves, 'applied': applied, 'pos': pos_bp.T}


# --------------------------- finite width ---------------------------


def _iter_walks_fw(carry, beta, update_slices, max_width, log2d_w32,
                   skip_w, cfg: SweepConfig, claim, on_block,
                   accept_rule, uniform_log2, sparse_w, log2_n_projs,
                   interpret, fast_slicer=False):
    # fast_slicer implies the state carries u = n_lanes union planes
    # between the index planes and c0 (see _apply_walks).
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _greedy_slices_fast,
                                                    _lcc_fw_b, _pc_width)

    (S, lt, slices, S_min, min_slices, min_lt, keys, pos, moves,
     applied) = carry
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    p = pos.shape[1]

    keys, leaf, rand_bit, u, (k_reslice,) = _draws(keys, nl, p, dtype, 5)
    leaf, rand_bit, u = leaf.T, rand_bit.T, u.T

    up = w if fast_slicer else 0      # union-plane count in S
    # ``lt`` rides in the carry (see _iter_walks): the pinned total of
    # S as left by the previous iteration, bitwise what the old entry
    # recompute produced.
    pos, ev = _propose_walks(S, pos, leaf, rand_bit, cfg, log2d_w32,
                             uniform_log2, dtype, sparse_w,
                             log2_n_projs, interpret,
                             slices_wb=slices, with_width=True, u=up)
    ev['new_width_b'] = _width_bn(ev['new_inds_b'], log2d_w32,
                                  uniform_log2, dtype, sparse_w=sparse_w,
                                  log2_n_projs=log2_n_projs)
    new_sliced_width = _width_bn(
        ev['new_inds_b'] & ~slices[:, :, None], log2d_w32, uniform_log2,
        dtype, sparse_w=sparse_w, log2_n_projs=log2_n_projs)
    fits = new_sliced_width <= max_width + _WIDTH_EPS
    if accept_rule == 'chained' and _chains_lt(cfg):
        valid = (ev['b'] != NULL) & (ev['a'] != NULL) & fits
        accept, keep = _claim_sequential_chained(cfg, u, beta, lt,
                                                 valid, ev)
    else:
        accept = _accept_walks(ev, lt, u, beta, cfg) & fits
        keep = (_claim_sequential if claim == 'sequential' else
                _claim_pairwise)(accept, ev)
    S = _apply_walks(S, ev, keep, cfg, dtype, interpret,
                     with_width=True, u=up)

    pos = _advance_walks(ev['a'], accept, keep, on_block)
    moves = moves + jnp.int32(p * pos.shape[0])
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    sp_w1 = None if sparse_w is None else sparse_w[:, None]

    def do_reslice(args):
        slices_, S_, lt_post = args
        # The slicer + slice-aware lcc rebuild run on the PADDED node
        # axis: pad rows are inert (c0 NULL -> leaf -> lcc exactly
        # -inf, width 0), so totals stay bit-identical to the unpadded
        # engines.
        if fast_slicer:
            # Plane-layout path: the sorted-space slicer reads the
            # index planes in place, and the lcc rebuild is one
            # popcount pass over the incrementally-maintained union
            # planes — no unpack transposes, no Q=N child gathers.
            # Values are bit-identical to the reference path below
            # (same slicer selection, same _pc_width op on the same
            # union bits).
            width_nb = _join_f(
                S_[w + up + 2 + nk:w + up + 2 + 2 * nk], dtype).T
            new_slices = _greedy_slices_fast(
                None, width_nb, k_reslice, max_width, log2d_w32,
                skip_w[:, None], uniform_log2,
                vals=S_, vals_planes=(0, w))
            internal = _i32(S_[w + up]) != NULL          # [B, N]
            union = S_[w:w + up] | new_slices[:, :, None]
            lcc_bn = _pc_width(union, uniform_log2, dtype, sparse_w,
                               log2_n_projs, word_axis=0)
            new_lcc_bn = jnp.where(internal, lcc_bn,
                                   -jnp.inf).astype(dtype)
            new_lt = costs_ops.log2_total_from_lcc_last(new_lcc_bn, nl)
        else:
            c0, c1, par, inds, lcc, width = _unpack_w(
                S_, w, dtype, S_.shape[2], fw=True, u=up)
            new_slices = _greedy_slices_b(
                c0, inds, width, k_reslice, max_width, log2d_w32,
                skip_w[:, None], sp_w1, log2_n_projs,
                uniform_log2=uniform_log2)
            new_lcc_bn = _lcc_fw_b(c0, c1, inds, new_slices, log2d_w32,
                                   sp_w1, log2_n_projs,
                                   uniform_log2=uniform_log2).T
            new_lt = costs_ops.log2_total_from_lcc_last(new_lcc_bn, nl)
        # ``lt_post`` is the pinned total of S_ (post-apply), computed
        # once by the caller — bitwise what the old in-branch recompute
        # produced.  Per-replica merge: better rows take new_lcc whose
        # pinned total IS new_lt, others keep lcc_cur whose total IS
        # lt_post, so the merged total needs no recompute either.
        better = new_lt < lt_post
        slices_out = jnp.where(better[None, :], new_slices, slices_)
        lcc_cur = _join_f(S_[w + up + 2:w + up + 2 + nk], dtype)
        lcc_out = jnp.where(better[:, None], new_lcc_bn, lcc_cur)
        S_out = S_.at[w + up + 2:w + up + 2 + nk].set(_split_f(lcc_out))
        return slices_out, S_out, jnp.where(better, new_lt, lt_post)

    lt_post = _lt_from_S(S, w, nk, nl, dtype, u=up)
    has_slices = jnp.any(slices != 0)
    slices, S, lt_new = jax.lax.cond(update_slices & has_slices,
                                     do_reslice, lambda x: x,
                                     (slices, S, lt_post))

    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)

    def snap(args):
        S_min, min_slices = args
        return (jnp.where(improved[None, :, None], S, S_min),
                jnp.where(improved[None, :], slices, min_slices))

    S_min, min_slices = jax.lax.cond(
        jnp.any(improved), snap, lambda x: x, (S_min, min_slices))
    return (S, lt_new, slices, S_min, min_slices, min_lt, keys, pos,
            moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'claim', 'on_block',
                                       'accept_rule', 'uniform_log2',
                                       'interpret', 'slicer'))
def run_walks_fw(batch, betas, update_slices_mask, max_width, log2d_w32,
                 skip_wb, cfg: SweepConfig, pos, sparse_wb=None,
                 log2_n_projs=None, *, claim='sequential',
                 on_block='advance', accept_rule='round',
                 uniform_log2=None, interpret=None, slicer=None):
    """Finite-width chained multi-walk rounds (one per beta).

    Width-capped proposals against the shared slice lanes + the
    periodic greedy reslice-if-better, mirroring the other FW engines'
    cadence semantics.

    ``slicer``: None = auto (plane-layout incremental path when dims
    are uniform powers of two), ``'plane'`` = require it, ``'ref'`` =
    force the reference-shaped slow path.  The plane path carries W
    union planes through every apply scatter and snapshot — a
    throughput trade that pays at reslice cadence 2 but costs
    state-streaming width at sparse cadences (round-5 probe thread,
    docs/ROADMAP.md).
    """
    from tnco_tpu.kernels.sa_finite_batched import SABatchFW

    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    max_width = jnp.asarray(max_width, dtype)
    sparse_w = None if sparse_wb is None else \
        jnp.asarray(sparse_wb).reshape(-1)
    skip_w = jnp.asarray(skip_wb).reshape(-1)

    S = _pack_w(batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
                width=batch.width)
    S_min = _pack_w(batch.min_c0, batch.min_c1, batch.min_par,
                    batch.min_inds, batch.lcc, width=batch.width)

    # Uniform power-of-two dims + no sparse indices: the reslice runs
    # the plane-layout sorted-space slicer and rebuilds lcc from union
    # planes (U[i] = inds[c0]|inds[c1], maintained by the apply
    # scatter).  Gate matches _greedy_slices_b's fast-path condition.
    fast_slicer = (uniform_log2 is not None and sparse_wb is None
                   and float(uniform_log2).is_integer())
    if slicer == 'ref':
        fast_slicer = False
    elif slicer == 'plane':
        if not fast_slicer:
            raise ValueError("slicer='plane' needs uniform power-of-two "
                             "dims and no sparse indices.")
    elif slicer is not None:
        raise ValueError(f"slicer must be None, 'plane' or 'ref', "
                         f"got {slicer!r}.")
    u = w if fast_slicer else 0
    if fast_slicer:
        c0_pad = _i32(S[w])                              # [B, N_pad]
        c1_pad = _i32(S[w + 1])
        u0 = gather_gbn(S, c0_pad, interpret=interpret, planes=(0, w))
        u1 = gather_gbn(S, c1_pad, interpret=interpret, planes=(0, w))
        U = u0 | u1                                      # [w, B, N_pad]
        # U sits between the index planes and c0 so the merged {B, A}
        # apply scatter covers it in one contiguous range.
        S = jnp.concatenate([S[:w], U, S[w:]], axis=0)
        # S_min's union planes are never read (the min state is not
        # resliced); they ride along only to keep the snap shapes equal.
        S_min = jnp.concatenate([S_min[:w], U, S_min[w:]], axis=0)

    def step(carry, x):
        beta, upd = x
        return _iter_walks_fw(carry, beta, upd, max_width, log2d_w32,
                              skip_w, cfg, claim, on_block, accept_rule,
                              uniform_log2, sparse_w, log2_n_projs,
                              interpret, fast_slicer=fast_slicer), None

    carry = (S, _lt_from_S(S, w, nk, nl, dtype, u=u), batch.slices,
             S_min, batch.min_slices, batch.min_log2_total, batch.keys,
             pos.T, jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, (betas, update_slices_mask))
    (S, lt, slices, S_min, min_slices, min_lt, keys, pos_bp, moves,
     applied) = carry

    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    S_min = jnp.where(improved[None, :, None], S, S_min)
    min_slices = jnp.where(improved[None, :], slices, min_slices)
    n = batch.c0.shape[0]
    c0, c1, par, inds, lcc, width = _unpack_w(S, w, dtype, n, fw=True,
                                              u=u)
    mc0, mc1, mpar, minds, _ml, _mw = _unpack_w(S_min, w, dtype, n,
                                                fw=True, u=u)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatchFW(c0, c1, par, inds, hyper, lcc, width, slices, lt,
                    min_lt, mc0, mc1, mpar, minds, min_slices, keys)
    return out, {'moves': moves, 'applied': applied, 'pos': pos_bp.T}


# --------------------------- multi-chip ---------------------------


def _batch_specs(batch, axes):
    """PartitionSpecs for a lane-major batch pytree: every leaf carries
    the replica axis LAST except ``keys`` ([B, 2], replica-first)."""
    from jax.sharding import PartitionSpec as P

    leaves, treedef = jax.tree.flatten(batch)

    def spec(x, replica_axis):
        s = [None] * x.ndim
        s[replica_axis] = axes
        return P(*s)

    specs = [spec(x, -1) for x in leaves[:-1]] + [spec(leaves[-1], 0)]
    return jax.tree.unflatten(treedef, specs)


@fts.partial(jax.jit, static_argnames=('cfg', 'mesh', 'log2_n_projs',
                                       'claim', 'on_block', 'accept_rule',
                                       'uniform_log2', 'interpret',
                                       'slicer'))
def run_walks_sharded(batch, betas, log2d_w32, cfg: SweepConfig, pos,
                      mesh, sparse_wb=None, log2_n_projs=None, *,
                      claim='sequential', on_block='advance',
                      accept_rule='round',
                      uniform_log2=None, interpret=None, fw_args=None,
                      slicer=None):
    """Replica-sharded chained walks over a ``jax.sharding.Mesh``.

    ``shard_map`` gives every device its local replica shard and runs
    the full engine on per-device shapes — the supported pattern for
    Pallas kernels on pods (a plain ``jit`` over sharded inputs would
    have to partition the Mosaic custom calls, which GSPMD cannot).
    Per-replica trajectories are bit-identical to the single-device
    engine (replicas are independent; tests enforce it on the virtual
    CPU mesh).  ``moves``/``applied`` are psum-reduced to replicated
    scalars.

    ``fw_args=(update_slices_mask, max_width, skip_wb)`` switches to the
    finite-width engine (``batch`` then is a ``SABatchFW``).

    This is the pod-scale execution of SURVEY.md §2.3: replicas over
    ICI/DCN mesh axes, exchange collectives layered outside (see
    ``parallel.replicas.exchange_best_sharded``).
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    specs = _batch_specs(batch, axes)
    pos_spec = P(None, axes)
    rep = P()
    fw = fw_args is not None
    has_sparse = sparse_wb is not None
    if not has_sparse:
        sparse_wb = jnp.zeros((), jnp.uint32)  # placeholder leaf
    if not fw:
        fw_args = jnp.zeros((), jnp.float32)   # placeholder leaf

    def body(b, pos_, betas_, log2d_, sparse_, fwa):
        sp = sparse_ if has_sparse else None
        if not fw:
            out, m = run_walks(b, betas_, log2d_, cfg, pos_, sp,
                               log2_n_projs, claim=claim,
                               on_block=on_block,
                               accept_rule=accept_rule,
                               uniform_log2=uniform_log2,
                               interpret=interpret)
        else:
            upd, max_width, skip_wb_ = fwa
            out, m = run_walks_fw(b, betas_, upd, max_width, log2d_,
                                  skip_wb_, cfg, pos_, sp,
                                  log2_n_projs, claim=claim,
                                  on_block=on_block,
                                  accept_rule=accept_rule,
                                  uniform_log2=uniform_log2,
                                  interpret=interpret, slicer=slicer)
        m = dict(m)
        m['moves'] = jax.lax.psum(m['moves'], axes)
        m['applied'] = jax.lax.psum(m['applied'], axes)
        return out, m

    metric_specs = {'moves': rep, 'applied': rep, 'pos': pos_spec}
    shmap = jax.shard_map(body, mesh=mesh,
                          in_specs=(specs, pos_spec, rep, rep, rep, rep),
                          out_specs=(specs, metric_specs),
                          check_vma=False)
    return shmap(batch, pos, betas, log2d_w32, sparse_wb, fw_args)
