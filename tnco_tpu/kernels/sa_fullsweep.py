"""Synchronous full-tree sweep SA engine: a proposal at EVERY node.

The multi-walk engines amortize row traffic over ``P`` concurrent walks,
but their row accesses still cost O(N) (masked reductions) or O(N/128)
(walker block sweeps) *per walk*.  This engine removes the walk
bookkeeping entirely: every internal node ``B`` (except the root)
proposes its uncle swap **simultaneously** each round.  That makes
``b`` the row index itself, so ``a = par[b]``, the children ids and
``inds[b]`` are plain *aligned* reads, and only the neighbor rows
(``a``, ``c``, children inds) need real gathers — a handful of gather
calls per round, amortized over ``N_int - 1`` proposals per replica.

Semantics are the natural completion of the multi-walk family: the
per-node proposal math (D-shares-index-with-C rule, on-the-fly hyper
rows, log2-domain Metropolis against the round-start total) is
identical to :mod:`tnco_tpu.kernels.sa_multiwalk`; only the conflict
filter differs.  With ~N/2 concurrent proposals a sequential priority
scan is impossible, so disjointness is resolved by one round of
random-priority independent-set selection (Luby-style): every accepted
node draws a unique priority and is applied iff it beats every
*accepted* proposal in its distance-<=2 conflict neighborhood
(12 candidates: parent, sibling, both children, grandparent, uncle,
both nephews, all four grandchildren).  Winners' ``{A,B,C,D,E}`` sets
are pairwise disjoint (mutual strict comparison), so the simultaneous
application equals some sequential application order.

Reference semantics: the per-proposal geometry and cost rule transcribe
include/tnco/optimize/infinite_memory/optimizer.hpp:117-192 (and
finite_width/greedy/optimizer.hpp:188-225 for the width-capped
variant); the synchronous schedule and Luby conflict filter are
original, TPU-first scheduling (the reference is single-threaded and
needs neither).
"""

import functools as fts

import jax
import jax.numpy as jnp

from tnco_tpu.kernels.sa_batched import (SABatch, _log2_total_b, _width_b,
                                         compute_hyper_b)
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import costs as costs_ops

__all__ = ['run_fullsweep', 'run_fullsweep_fw']

NULL = -1
# Priority layout: bit 31 clear (sign), bits 30..15 random, bits 14..0
# the node id — strictly unique per (node, replica), so the neighbor
# comparison below never ties and the kept sets are provably disjoint.
_PRIO_ID_BITS = 15


def _take_i(arr, idx):
    """Row gather of ``[N, B]`` at ``[M, B]`` ids (NULL-safe -> row 0)."""
    return jnp.take_along_axis(arr, jnp.maximum(idx, 0), axis=0)


def _take_u(arr, idx):
    """Row gather of ``[N, W, B]`` at ``[M, B]`` ids (NULL-safe)."""
    return jnp.take_along_axis(arr, jnp.maximum(idx, 0)[:, None, :],
                               axis=0)


def _draws_full(keys, n_int, dtype):
    """Per-lane draws for one round: D/E tie bits, accept uniforms and
    conflict priorities (one threefry stream per replica, as everywhere
    else in the lane-major family)."""
    split = jax.vmap(lambda k: tuple(jax.random.split(k, 4)))
    keys, k_pick, k_u, k_prio = split(keys)
    rand_bit = jax.vmap(lambda k: jax.random.bernoulli(k, shape=(n_int,)),
                        out_axes=1)(k_pick)
    u = jax.vmap(lambda k: jax.random.uniform(k, (n_int,), dtype=dtype),
                 out_axes=1)(k_u)
    bits = jax.vmap(lambda k: jax.random.bits(k, (n_int,)),
                    out_axes=1)(k_prio)
    return keys, rand_bit, u, bits


def _propose_full(c0, c1, par, inds, lcc, rand_bit, cfg):
    """Aligned-row proposal evaluation at every internal node.

    Returns per-proposal ids/lanes shaped ``[NI, B]`` / ``[NI, W, B]``
    where row ``i`` is internal node ``n_leaves + i``.
    """
    n, b_dim = c0.shape
    nl = cfg.n_leaves
    ni = n - nl
    b_iota = jnp.arange(nl, n, dtype=jnp.int32)[:, None]
    b_ids = jnp.broadcast_to(b_iota, (ni, b_dim))

    a = par[nl:]
    c0b, c1b = c0[nl:], c1[nl:]
    inds_b, l_b = inds[nl:], lcc[nl:]

    c0a = _take_i(c0, a)
    c1a = _take_i(c1, a)
    l_a = _take_i(lcc, a)
    c = jnp.where(c0a == b_ids, c1a, c0a)

    inds_a = _take_u(inds, a)
    inds_c = _take_u(inds, c)
    inds0 = _take_u(inds, c0b)
    inds1 = _take_u(inds, c1b)

    i0 = jnp.any(inds0 & inds_c, axis=1)
    i1 = jnp.any(inds1 & inds_c, axis=1)
    take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1), rand_bit, i0)
    d = jnp.where(take0, c0b, c1b)
    e = jnp.where(take0, c1b, c0b)
    t0m = take0[:, None, :]
    inds_d = jnp.where(t0m, inds0, inds1)
    inds_e = jnp.where(t0m, inds1, inds0)

    hyp_a = inds_a & inds_b & inds_c
    hyp_b = inds_b & inds0 & inds1
    new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

    return dict(a=a, b=b_ids, c=c, d=d, e=e, c0a=c0a, c1a=c1a, c0b=c0b,
                c1b=c1b, inds_a=inds_a, inds_b=inds_b, inds_c=inds_c,
                inds_d=inds_d, inds_e=inds_e, new_inds_b=new_inds_b,
                l_a=l_a, l_b=l_b)


def _luby_keep(accept, prio_bits, ev, c0, c1, par, n_leaves):
    """One round of random-priority independent-set selection.

    ``kept[b] = accept[b] and prio[b] > prio of every accepted proposal
    in b's conflict neighborhood``.  Priorities are strictly unique
    (node id in the low bits), so two conflicting accepted proposals
    can never both win, and the kept ``{A,B,C,D,E}`` sets are pairwise
    disjoint.
    """
    n, b_dim = c0.shape
    ni = accept.shape[0]
    ids = jnp.arange(n_leaves, n, dtype=jnp.uint32)[:, None]
    rand_mask = (0xFFFFFFFF << _PRIO_ID_BITS) & 0x7FFFFFFF
    prio = jnp.bitwise_or(prio_bits & jnp.uint32(rand_mask),
                          ids).astype(jnp.int32)
    r_acc = jnp.where(accept, prio, jnp.int32(NULL))
    # Padded to all N rows: leaves (and non-accepted nodes) hold -1, so
    # NULL-clipped gathers below can only ever read a harmless -1.
    r_full = jnp.concatenate(
        [jnp.full((n_leaves, b_dim), NULL, jnp.int32), r_acc], axis=0)

    a, c, d, e = ev['a'], ev['c'], ev['d'], ev['e']
    gp = _take_i(par, a)
    c0gp = _take_i(c0, gp)
    c1gp = _take_i(c1, gp)
    uncle = jnp.where(c0gp == a, c1gp, c0gp)
    uncle = jnp.where(gp == NULL, NULL, uncle)
    nbrs = jnp.concatenate([
        a, c, d, e, gp, uncle,
        _take_i(c0, c), _take_i(c1, c),          # nephews
        _take_i(c0, d), _take_i(c1, d),          # grandchildren via D
        _take_i(c0, e), _take_i(c1, e),          # grandchildren via E
    ], axis=0)
    rn = jnp.where(nbrs == NULL, jnp.int32(NULL), _take_i(r_full, nbrs))
    r_max = jnp.max(rn.reshape(12, ni, b_dim), axis=0)
    return accept & (r_acc > r_max)


def _apply_full(c0, c1, par, inds, lcc, kept, ev, width_pre=None):
    """Applies all kept proposals (pairwise-disjoint rows).

    ``B`` rows are aligned masked updates; ``A``/``C``/``E`` rows are
    drop-mode scatters at unique indices.
    """
    n, b_dim = c0.shape
    ni = kept.shape[0]
    nl = n - ni
    cols = jnp.broadcast_to(jnp.arange(b_dim)[None, :], (ni, b_dim))

    def scat(dst, rows, upd):
        idx = jnp.where(kept, rows, n)  # out of range -> dropped
        return dst.at[idx, cols].set(upd, mode='drop',
                                     unique_indices=False)

    a, c, e = ev['a'], ev['c'], ev['e']
    # B rows (aligned): swap E -> C in the children, new inds/lcc.
    kf = kept[:, None, :]
    new_c0b = jnp.where(ev['c0b'] == e, c, ev['c0b'])
    new_c1b = jnp.where(ev['c1b'] == e, c, ev['c1b'])
    c0 = c0.at[nl:].set(jnp.where(kept, new_c0b, ev['c0b']))
    c1 = c1.at[nl:].set(jnp.where(kept, new_c1b, ev['c1b']))
    lcc = lcc.at[nl:].set(jnp.where(kept, ev['ln_b'], ev['l_b']))
    inds = inds.at[nl:].set(
        jnp.where(kept[:, None, :], ev['new_inds_b'], ev['inds_b']))

    # A rows: swap C -> E in the children, new lcc.
    c0 = scat(c0, a, jnp.where(ev['c0a'] == c, e, ev['c0a']))
    c1 = scat(c1, a, jnp.where(ev['c1a'] == c, e, ev['c1a']))
    lcc = scat(lcc, a, ev['ln_a'])
    # C and E rows: reparent.
    par = scat(par, c, ev['b'])
    par = scat(par, e, a)

    if width_pre is not None:
        w_b = width_pre[nl:]
        width_pre = width_pre.at[nl:].set(
            jnp.where(kept, ev['new_width_b'], w_b))
        return c0, c1, par, inds, lcc, width_pre
    return c0, c1, par, inds, lcc


def _iter_fullsweep(carry, beta, log2d_w32, cfg: SweepConfig, sparse_wb,
                    log2_n_projs):
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par, min_inds,
     keys, moves, applied) = carry
    nl = cfg.n_leaves
    ni = c0.shape[0] - nl

    keys, rand_bit, u, prio_bits = _draws_full(keys, ni, log2d_w32.dtype)
    lt = _log2_total_b(lcc, nl)

    ev = _propose_full(c0, c1, par, inds, lcc, rand_bit, cfg)

    def width(lanes_mwb):  # [NI, W, B] -> [NI, B]
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs))(lanes_mwb)

    ev['ln_b'] = width(ev['inds_d'] | ev['inds_c'])
    ev['ln_a'] = width(ev['new_inds_b'] | ev['inds_e'])
    l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'], ev['l_b'],
                                     ev['ln_a'], ev['ln_b'])
    if cfg.prob_kind == 'mh':
        accept = jnp.log2(u) <= -beta * (l_new - lt[None, :])
    elif cfg.prob_kind == 'greedy':
        accept = l_new <= lt[None, :]
    else:
        accept = jnp.ones_like(l_new, dtype=bool)
    accept = accept & (ev['a'] != NULL)

    kept = _luby_keep(accept, prio_bits, ev, c0, c1, par, nl)
    c0, c1, par, inds, lcc = _apply_full(c0, c1, par, inds, lcc, kept, ev)

    moves = moves + jnp.int32(ni * accept.shape[1])
    applied = applied + jnp.sum(kept.astype(jnp.int32))

    lt_new = _log2_total_b(lcc, nl)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)

    def snap(args):
        min_c0, min_c1, min_par, min_inds = args
        impn = improved[None, :]
        impw = improved[None, None, :]
        return (jnp.where(impn, c0, min_c0), jnp.where(impn, c1, min_c1),
                jnp.where(impn, par, min_par),
                jnp.where(impw, inds, min_inds))

    min_c0, min_c1, min_par, min_inds = jax.lax.cond(
        jnp.any(improved), snap, lambda x: x,
        (min_c0, min_c1, min_par, min_inds))

    return (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par,
            min_inds, keys, moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg',))
def run_fullsweep(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
                  sparse_wb=None, log2_n_projs=None):
    """One synchronous full-tree round per beta.

    Proposals per round = ``(N_int - 1) * B`` (every internal node except
    the root).  Returns the updated batch and
    ``{'moves', 'applied'}`` metrics, like the other lane-major engines.
    """

    def step(carry, beta):
        carry = _iter_fullsweep(carry, beta, log2d_w32, cfg, sparse_wb,
                                log2_n_projs)
        return carry, None

    carry = (batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
             batch.min_log2_total, batch.min_c0, batch.min_c1,
             batch.min_par, batch.min_inds, batch.keys, jnp.int32(0),
             jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, betas)
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par, min_inds,
     keys, moves, applied) = carry
    lt = _log2_total_b(lcc, cfg.n_leaves)
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    impn, impw = improved[None, :], improved[None, None, :]
    min_c0 = jnp.where(impn, c0, min_c0)
    min_c1 = jnp.where(impn, c1, min_c1)
    min_par = jnp.where(impn, par, min_par)
    min_inds = jnp.where(impw, inds, min_inds)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt, min_c0,
                  min_c1, min_par, min_inds, keys)
    return out, {'moves': moves, 'applied': applied}


def _iter_fullsweep_fw(carry, beta, update_slices, max_width, log2d_w32,
                       skip_wb, cfg, sparse_wb, log2_n_projs):
    """Finite-width synchronous round: width-capped proposals against the
    shared slice lanes + the periodic greedy reslice-if-better (same
    cadence semantics as the other FW engines)."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _lcc_fw_b)

    (c0, c1, par, inds, lcc, width_pre, slices, min_lt, min_c0, min_c1,
     min_par, min_inds, min_slices, keys, moves, applied) = carry
    nl = cfg.n_leaves
    ni = c0.shape[0] - nl

    split = jax.vmap(lambda k: tuple(jax.random.split(k, 5)))
    keys, k_pick, k_u, k_prio, k_reslice = split(keys)
    rand_bit = jax.vmap(lambda k: jax.random.bernoulli(k, shape=(ni,)),
                        out_axes=1)(k_pick)
    u = jax.vmap(lambda k: jax.random.uniform(k, (ni,),
                                              dtype=log2d_w32.dtype),
                 out_axes=1)(k_u)
    prio_bits = jax.vmap(lambda k: jax.random.bits(k, (ni,)),
                         out_axes=1)(k_prio)

    lt = _log2_total_b(lcc, nl)
    ev = _propose_full(c0, c1, par, inds, lcc, rand_bit, cfg)

    def width(lanes_mwb):
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs))(lanes_mwb)

    sl = slices[None, :, :]
    ev['new_width_b'] = width(ev['new_inds_b'])
    new_sliced_width_b = width(ev['new_inds_b'] & ~sl)
    fits = new_sliced_width_b <= max_width + _WIDTH_EPS
    ev['ln_b'] = width((ev['inds_d'] | ev['inds_c']) | sl)
    ev['ln_a'] = width((ev['new_inds_b'] | ev['inds_e']) | sl)
    l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'], ev['l_b'],
                                     ev['ln_a'], ev['ln_b'])
    if cfg.prob_kind == 'mh':
        accept = jnp.log2(u) <= -beta * (l_new - lt[None, :])
    elif cfg.prob_kind == 'greedy':
        accept = l_new <= lt[None, :]
    else:
        accept = jnp.ones_like(l_new, dtype=bool)
    accept = accept & (ev['a'] != NULL) & fits

    kept = _luby_keep(accept, prio_bits, ev, c0, c1, par, nl)
    c0, c1, par, inds, lcc, width_pre = _apply_full(
        c0, c1, par, inds, lcc, kept, ev, width_pre=width_pre)

    moves = moves + jnp.int32(ni * accept.shape[1])
    applied = applied + jnp.sum(kept.astype(jnp.int32))

    def do_reslice(args):
        slices_, lcc_ = args
        new_slices = _greedy_slices_b(c0, inds, width_pre, k_reslice,
                                      max_width, log2d_w32, skip_wb,
                                      sparse_wb, log2_n_projs)
        new_lcc = _lcc_fw_b(c0, c1, inds, new_slices, log2d_w32,
                            sparse_wb, log2_n_projs)
        better = (_log2_total_b(new_lcc, nl) < _log2_total_b(lcc_, nl))
        return (jnp.where(better[None, :], new_slices, slices_),
                jnp.where(better[None, :], new_lcc, lcc_))

    has_slices = jnp.any(slices != 0)
    slices, lcc = jax.lax.cond(update_slices & has_slices, do_reslice,
                               lambda x: x, (slices, lcc))

    lt_new = _log2_total_b(lcc, nl)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)

    def snap(args):
        min_c0, min_c1, min_par, min_inds, min_slices = args
        impn = improved[None, :]
        impw = improved[None, None, :]
        return (jnp.where(impn, c0, min_c0), jnp.where(impn, c1, min_c1),
                jnp.where(impn, par, min_par),
                jnp.where(impw, inds, min_inds),
                jnp.where(impn, slices, min_slices))

    min_c0, min_c1, min_par, min_inds, min_slices = jax.lax.cond(
        jnp.any(improved), snap, lambda x: x,
        (min_c0, min_c1, min_par, min_inds, min_slices))

    return (c0, c1, par, inds, lcc, width_pre, slices, min_lt, min_c0,
            min_c1, min_par, min_inds, min_slices, keys, moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg',))
def run_fullsweep_fw(batch, betas, update_slices_mask, max_width,
                     log2d_w32, skip_wb, cfg, sparse_wb=None,
                     log2_n_projs=None):
    """Finite-width synchronous full-tree rounds (one per beta)."""
    from tnco_tpu.kernels.sa_finite_batched import SABatchFW

    max_width = jnp.asarray(max_width, log2d_w32.dtype)

    def step(carry, x):
        beta, upd = x
        carry = _iter_fullsweep_fw(carry, beta, upd, max_width,
                                   log2d_w32, skip_wb, cfg, sparse_wb,
                                   log2_n_projs)
        return carry, None

    carry = (batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
             batch.width, batch.slices, batch.min_log2_total,
             batch.min_c0, batch.min_c1, batch.min_par, batch.min_inds,
             batch.min_slices, batch.keys, jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, (betas, update_slices_mask))
    (c0, c1, par, inds, lcc, width_pre, slices, min_lt, min_c0, min_c1,
     min_par, min_inds, min_slices, keys, moves, applied) = carry
    lt = _log2_total_b(lcc, cfg.n_leaves)
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    impn, impw = improved[None, :], improved[None, None, :]
    min_c0 = jnp.where(impn, c0, min_c0)
    min_c1 = jnp.where(impn, c1, min_c1)
    min_par = jnp.where(impn, par, min_par)
    min_inds = jnp.where(impw, inds, min_inds)
    min_slices = jnp.where(impn, slices, min_slices)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatchFW(c0, c1, par, inds, hyper, lcc, width_pre, slices, lt,
                    min_lt, min_c0, min_c1, min_par, min_inds, min_slices,
                    keys)
    return out, {'moves': moves, 'applied': applied}
