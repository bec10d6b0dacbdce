"""Multi-walk lane-major SA engine: P concurrent walks per replica.

The lane-major engines (:mod:`tnco_tpu.kernels.sa_batched`) pay O(N*W)
masked-reduction traffic per *move*: every row gather/write is a full pass
over the ``[N, W, B]`` state.  This engine runs ``P`` independent
leaf-to-root walks per replica *in the same pass*: all ``P`` row gathers
are sibling reductions over one array traversal (XLA multi-output fusion)
and all ``P`` row writes combine into one additive update (proposals are
applied only when their node neighborhoods are pairwise disjoint, so the
deltas land on disjoint rows and integer adds replace exactly) — per-move
state traffic drops by up to ``P``.

Semantics: a *synchronous* (Jacobi-style) SA variant.  Each iteration,
every walk proposes its uncle-swap against the same total cost ``lt`` and
is Metropolis-accepted independently; accepted proposals are applied only
if their ``{A, B, C, D, E}`` neighborhoods don't overlap a higher-priority
accepted walk's (lower walk index wins).  Walks restart at a fresh random
leaf as soon as they reach the root — no lockstep tail.  The per-walk
proposal math (shared-index guarantee, hyper updates, log2-domain
Metropolis rule) is identical to the reference sweep
(include/tnco/optimize/infinite_memory/optimizer.hpp:90-221); only the
walk scheduling differs, so this engine trades bit-parity with the
sequential engines for throughput.

Large networks / large ``P``: pass ``walk_chunk`` to evaluate and apply
walks in groups of that size.  Grouping bounds the fused ``[P, N, W, B]``
broadcast temporaries (which otherwise stall XLA compilation at
Sycamore-scale shapes for B >= 256) at ``[walk_chunk, N, W, B]`` while
keeping results bit-identical: kept proposals touch pairwise-disjoint
rows, so per-group additive application only ever adds exact zeros
elsewhere.  The conflict filter itself is pairwise on node ids —
O(P^2 * B), independent of the tree size.

The infinite-memory and finite-width iterations share the proposal
geometry, conflict filter and additive application through the helpers
below; the finite-width variant adds the width cap, shared slice lanes
and the periodic greedy reslice (same cadence as the lockstep FW engine).
"""

import functools as fts

import jax
import jax.numpy as jnp

from tnco_tpu.kernels.sa_batched import (SABatch, _log2_total_b, _width_b,
                                         compute_hyper_b)
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import costs as costs_ops

__all__ = ['run_multiwalk', 'run_multiwalk_fw']

NULL = -1


def _helpers(iota_n):
    def row_mask(x):  # [P, B] -> [P, N, B]
        return iota_n[None, :, :] == x[:, None, :]

    def grow_i(arr_nb, mask):  # [N,B], [P,N,B] -> [P,B]
        return jnp.sum(jnp.where(mask, arr_nb[None], 0), axis=1,
                       dtype=arr_nb.dtype)

    def grow_f(arr_nb, mask):
        return jnp.sum(jnp.where(mask, arr_nb[None], 0.0), axis=1)

    def grow_u(arr_nwb, mask):  # [N,W,B], [P,N,B] -> [P,W,B]
        return jnp.sum(jnp.where(mask[:, :, None, :], arr_nwb[None],
                                 jnp.uint32(0)), axis=1, dtype=jnp.uint32)

    return row_mask, grow_i, grow_f, grow_u


def _propose(c0, c1, par, inds, lcc, pos, leaf, rand_bit, cfg, iota_n):
    """Shared proposal geometry for one group of walks of all lanes.

    Restarts finished walks at ``leaf``, gathers the {A,B,C,D,E}
    neighborhood, picks D/E with the shared-index guarantee and builds
    ``new_inds_b`` with on-the-fly hyper rows.  Returns per-walk node ids
    and index-lane sets; the ``[P, N, B]`` row masks never escape (they
    are rebuilt where needed so group-wise evaluation stays bounded).
    """
    row_mask, grow_i, grow_f, grow_u = _helpers(iota_n)

    # Restart finished walks at a fresh leaf.
    par_pos = grow_i(par, row_mask(jnp.maximum(pos, 0)))
    at_boundary = (pos == NULL) | (par_pos == NULL)
    new_pos = grow_i(par, row_mask(leaf))
    pos = jnp.where(at_boundary, new_pos, pos)

    b = pos  # [P, B]
    m_b = row_mask(b)
    a = grow_i(par, m_b)
    a = jnp.where(b == NULL, NULL, a)  # trivial-tree guard
    c0b = grow_i(c0, m_b)
    c1b = grow_i(c1, m_b)
    m_a = row_mask(a)
    c0a = grow_i(c0, m_a)
    c1a = grow_i(c1, m_a)
    c = jnp.where(c0a == b, c1a, c0a)

    inds_c = grow_u(inds, row_mask(c))
    inds0 = grow_u(inds, row_mask(c0b))
    inds1 = grow_u(inds, row_mask(c1b))
    inds_a = grow_u(inds, m_a)
    inds_b = grow_u(inds, m_b)
    i0 = jnp.any(inds0 & inds_c, axis=1)  # [P, B]
    i1 = jnp.any(inds1 & inds_c, axis=1)
    take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1), rand_bit, i0)
    d = jnp.where(take0, c0b, c1b)
    e = jnp.where(take0, c1b, c0b)
    t0m = take0[:, None, :]
    inds_d = jnp.where(t0m, inds0, inds1)
    inds_e = jnp.where(t0m, inds1, inds0)

    # hyper on the fly (exact invariant hyper[i] = inds[i] & children)
    hyp_a = inds_a & inds_b & inds_c
    hyp_b = inds_b & inds0 & inds1
    new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

    return dict(a=a, b=b, c=c, d=d, e=e, c0a=c0a, c1a=c1a, c0b=c0b,
                c1b=c1b, inds_b=inds_b, inds_c=inds_c, inds_d=inds_d,
                inds_e=inds_e, new_inds_b=new_inds_b,
                l_a=grow_f(lcc, m_a), l_b=grow_f(lcc, m_b))


_EV_IDS = ('a', 'b', 'c', 'd', 'e', 'c0a', 'c1a', 'c0b', 'c1b')


def _eval_chunked(body, pos, leaf, rand_bit, walk_chunk):
    """Evaluates ``body(pos, leaf, rand_bit)`` over walk groups.

    ``body`` maps ``[Pc, B]`` per-walk draws to a dict of per-walk
    ``[Pc, ...]`` arrays (the compact evaluation: node ids, widths and
    ``dinds`` — never ``[Pc, N, B]`` masks).  With ``walk_chunk`` in
    (0, P) the groups run under ``lax.map`` so only one group's fused
    temporaries are live at a time.
    """
    p = pos.shape[0]
    if walk_chunk < 0:
        raise ValueError(f"walk_chunk ({walk_chunk}) must be >= 0.")
    if not walk_chunk or walk_chunk >= p:
        return body(pos, leaf, rand_bit)
    if p % walk_chunk:
        raise ValueError(
            f"walk_chunk ({walk_chunk}) must divide n_walks ({p}).")
    g = p // walk_chunk

    def regroup(x):
        return x.reshape((g, walk_chunk) + x.shape[1:])

    out = jax.lax.map(lambda xs: body(*xs),
                      (regroup(pos), regroup(leaf), regroup(rand_bit)))
    return jax.tree.map(lambda x: x.reshape((p,) + x.shape[2:]), out)


def _accept(cfg, u, beta, l_new, lt, ev):
    if cfg.prob_kind == 'mh':
        acc = jnp.log2(u) <= -beta * (l_new - lt[None, :])
    elif cfg.prob_kind == 'greedy':
        acc = l_new <= lt[None, :]
    else:
        acc = jnp.ones_like(l_new, dtype=bool)
    # Root-adjacent walks (B is the root: no uncle) only advance.
    return acc & (ev['b'] != NULL) & (ev['a'] != NULL)


_ON_BLOCK = ('advance', 'restart', 'dedup')


def _advance_walks(pos_a, accept, keep, on_block):
    """Next walk positions (``[P, B]``, walk axis FIRST) after claims.

    ``'advance'``: every walk climbs to A (the historical rule; a
    rejected proposal still moves up, like the sequential sweep).
    ``'restart'``: walks whose ACCEPTED proposal was discarded by the
    claim filter restart at a fresh leaf instead — otherwise two walks
    that collide both advance to the same parent and collide again at
    every level until the root ("convoy"; on deep width-capped trees
    leaf-to-root paths share long suffixes, so a convoy wastes one
    walk's whole remaining climb: measured 9-16% exact-duplicate
    positions at P=32 on width-capped Sycamore vs ~0.5% for
    independent walks, benchmarks/convoy_probe.py).  Metropolis-
    rejected walks still advance (native-engine parity: a rejected
    proposal advances in native/core.cpp sweep() too).
    ``'dedup'``: 'restart' + any walk positioned exactly on a
    lower-index live walk's node restarts too — also breaks convoys
    formed through rejected proposals, which 'restart' cannot see.

    Shared by the masked multi-walk engine and (via a transpose
    adapter) the pull/gather walks engine, so the two stay
    bit-identical under every ``on_block`` value.
    """
    if on_block not in _ON_BLOCK:
        raise ValueError(f"on_block must be one of {_ON_BLOCK}, "
                         f"got {on_block!r}.")
    if on_block == 'advance':
        return pos_a
    pos = jnp.where(accept & ~keep, NULL, pos_a)
    if on_block == 'dedup':
        p = pos.shape[0]
        lower = (jnp.arange(p)[None, :] <
                 jnp.arange(p)[:, None])                 # [q, p]: p < q
        same = pos[:, None, :] == pos[None, :, :]        # [q, p, B]
        dup = jnp.any(same & lower[:, :, None], axis=1) & (pos != NULL)
        pos = jnp.where(dup, NULL, pos)
    return pos


def _chained_accept_step(cfg, lt_run, beta, u_i, l_a, l_b, ln_a, ln_b):
    """One walk's Metropolis decision against the RUNNING total.

    Shared by both chained-acceptance claim scans (masked layout below,
    pull/gather layout in sa_walks) so the per-element float op tree is
    identical and the engines stay bit-identical under
    ``accept_rule='chained'``."""
    l_new = costs_ops.new_total_log2(lt_run, l_a, l_b, ln_a, ln_b)
    if cfg.prob_kind == 'mh':
        acc = jnp.log2(u_i) <= -beta * (l_new - lt_run)
    else:  # 'greedy' (lt-independent rules never reach here)
        acc = l_new <= lt_run
    return acc, l_new


def _chains_lt(cfg) -> bool:
    """Whether the acceptance rule depends on the total — i.e. whether
    ``accept_rule='chained'`` differs from 'round' at all.  For
    lt-independent rules (mh_local, always-accept) the chained scan
    would be a no-op, so callers fall back to the round path (which is
    also the cheaper program)."""
    return cfg.prob_kind in ('mh', 'greedy')


def _claim_chained(cfg, u, beta, lt, valid, ev):
    """Sequential-chain acceptance + claims in one priority scan.

    The round-mode engines accept every walk against the SAME pre-round
    total ``lt``: with k kept moves per iteration each decision is stale
    by up to the sum of the other k-1 deltas, a bias that grows with P
    (the round-2 sweep-engine calibration defect in miniature).  Here
    walk i's Metropolis test uses the running total of walks < i that
    were KEPT, so a round of pairwise-disjoint applied moves is
    *exactly* a sequential Metropolis chain: disjointness guarantees
    walk i's gathered rows (l_a, l_b, ln_a, ln_b, index sets) are
    unchanged by earlier kept walks, and the linear-domain delta is
    state-independent, so folding it into ``lt_run`` reproduces the
    one-move-at-a-time semantics bit-for-bit up to the shared
    ``new_total_log2`` op tree.

    Returns ``(accept, keep)`` ([P, B]); ``accept`` records each walk's
    decision at its own chain point (used by the walk schedules)."""
    nodes5 = jnp.stack([ev[k] for k in ('a', 'b', 'c', 'd', 'e')])
    p = valid.shape[0]
    walk_idx = jnp.arange(p)

    def step(pi, carry):
        keep, accept, lt_run = carry
        rows = jax.lax.dynamic_index_in_dim(nodes5, pi, axis=1,
                                            keepdims=False)  # [5, B]
        eq = rows[:, None, None, :] == nodes5[None]  # [5, 5, P, B]
        confl = jnp.any(eq, axis=(0, 1))  # [P, B]
        blocked = jnp.any(keep & confl & (walk_idx < pi)[:, None], axis=0)

        def take(x):
            return jax.lax.dynamic_index_in_dim(x, pi, keepdims=False)

        acc, l_new = _chained_accept_step(
            cfg, lt_run, beta, take(u), take(ev['l_a']), take(ev['l_b']),
            take(ev['ln_a']), take(ev['ln_b']))
        acc = acc & take(valid)
        kp = acc & ~blocked
        lt_run = jnp.where(kp, l_new, lt_run)
        keep = jax.lax.dynamic_update_index_in_dim(keep, kp, pi, axis=0)
        accept = jax.lax.dynamic_update_index_in_dim(accept, acc, pi,
                                                     axis=0)
        return keep, accept, lt_run

    zeros = jnp.zeros_like(valid)
    keep, accept, _ = jax.lax.fori_loop(0, p, step, (zeros, zeros, lt))
    return accept, keep


def _claim_disjoint(accept, ev):
    """Priority conflict filter: lower walk index wins; a proposal is
    applied only if none of its 5 nodes collides with an earlier applied
    walk's 5.  Pairwise node-id comparisons — O(P^2 * B) work independent
    of the tree size (accepted walks always carry 5 valid ids, and NULL
    ids of rejected walks never block anyone)."""
    nodes5 = jnp.stack([ev[k] for k in ('a', 'b', 'c', 'd', 'e')])
    p = accept.shape[0]
    walk_idx = jnp.arange(p)

    def claim(pi, keep):
        rows = jax.lax.dynamic_index_in_dim(nodes5, pi, axis=1,
                                            keepdims=False)  # [5, B]
        eq = rows[:, None, None, :] == nodes5[None]  # [5, 5, P, B]
        confl = jnp.any(eq, axis=(0, 1))  # [P, B]
        blocked = jnp.any(keep & confl & (walk_idx < pi)[:, None], axis=0)
        acc = jax.lax.dynamic_index_in_dim(accept, pi, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(
            keep, acc & ~blocked, pi, axis=0)

    return jax.lax.fori_loop(0, p, claim, jnp.zeros_like(accept))


def _apply_kept(c0, c1, par, inds, lcc, keep, ev, iota_n, walk_chunk,
                width_pre=None):
    """Applies all kept proposals additively (disjoint rows => at most one
    nonzero contribution per element), rebuilding row masks from node ids
    group by group so per-group temporaries stay at ``[Pc, N, B]``.

    If ``width_pre`` ([N, B] pre-slicing widths) is given, its B rows
    follow the rewrite using ``ev['new_width_b']`` (finite-width engines).
    """
    row_mask, grow_i, grow_f, _ = _helpers(iota_n)

    def one_group(state, ev_g, keep_g):
        c0, c1, par, inds, lcc, width_pre = state
        a, b, c, e = ev_g['a'], ev_g['b'], ev_g['c'], ev_g['e']
        m_a, m_b = row_mask(a), row_mask(b)
        m_c, m_e = row_mask(c), row_mask(e)
        kf = keep_g[:, None, :]  # [Pc, 1, B] over N

        def add_i(base, contrib):
            return base + jnp.sum(jnp.where(kf, contrib, 0), axis=0,
                                  dtype=base.dtype)

        ec = (e - c)[:, None, :]
        c0_delta = (m_a * (ev_g['c0a'] == c)[:, None, :] * ec -
                    m_b * (ev_g['c0b'] == e)[:, None, :] * ec)
        c1_delta = (m_a * (ev_g['c1a'] == c)[:, None, :] * ec -
                    m_b * (ev_g['c1b'] == e)[:, None, :] * ec)
        par_delta = (m_c * (b - a)[:, None, :] + m_e * (a - b)[:, None, :])
        c0 = add_i(c0, c0_delta)
        c1 = add_i(c1, c1_delta)
        par = add_i(par, par_delta)

        inds_delta = m_b[:, :, None, :] * ev_g['dinds'][:, None, :, :]
        inds = inds + jnp.sum(
            jnp.where(keep_g[:, None, None, :], inds_delta, jnp.uint32(0)),
            axis=0, dtype=jnp.uint32)

        lcc_delta = (m_a * (ev_g['ln_a'] - ev_g['l_a'])[:, None, :] +
                     m_b * (ev_g['ln_b'] - ev_g['l_b'])[:, None, :])
        lcc = lcc + jnp.sum(jnp.where(kf, lcc_delta, 0.0), axis=0)

        if width_pre is not None:
            w_b = grow_f(width_pre, m_b)
            width_delta = m_b * (ev_g['new_width_b'] - w_b)[:, None, :]
            width_pre = width_pre + jnp.sum(
                jnp.where(kf, width_delta, 0.0), axis=0)
        return (c0, c1, par, inds, lcc, width_pre)

    p = keep.shape[0]
    state = (c0, c1, par, inds, lcc, width_pre)
    if not walk_chunk or walk_chunk >= p:
        return one_group(state, ev, keep)
    g = p // walk_chunk

    def regroup(x):
        return x.reshape((g, walk_chunk) + x.shape[1:])

    ev_r = jax.tree.map(regroup, ev)
    keep_r = regroup(keep)

    def step(gi, state):
        take = fts.partial(jax.lax.dynamic_index_in_dim, index=gi, axis=0,
                           keepdims=False)
        return one_group(state, jax.tree.map(take, ev_r), take(keep_r))

    return jax.lax.fori_loop(0, g, step, state)


def _draws(keys, n, p, dtype, n_keys):
    """Per-lane key split + the per-walk draws every variant needs."""
    split = jax.vmap(lambda k: tuple(jax.random.split(k, n_keys)))
    keys, k_leaf, k_pick, k_u, *rest = split(keys)
    leaf = jax.vmap(lambda k: jax.random.randint(k, (p,), 0, n),
                    out_axes=1)(k_leaf)  # [P, B]
    rand_bit = jax.vmap(lambda k: jax.random.bernoulli(k, shape=(p,)),
                        out_axes=1)(k_pick)
    u = jax.vmap(lambda k: jax.random.uniform(k, (p,), dtype=dtype),
                 out_axes=1)(k_u)
    return keys, leaf, rand_bit, u, rest


def _iter_multiwalk(carry, beta, log2d_w32, cfg: SweepConfig, n_walks,
                    walk_chunk, iota_n, sparse_wb, log2_n_projs,
                    uniform_log2=None, on_block='advance',
                    accept_rule='round'):
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par, min_inds,
     keys, pos, moves, applied) = carry
    n_leaves = cfg.n_leaves

    keys, leaf, rand_bit, u, _ = _draws(keys, n_leaves, n_walks,
                                        log2d_w32.dtype, 4)

    def width(lanes_pwb):  # [Pc,W,B] -> [Pc,B]
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs,
                                uniform_log2=uniform_log2))(lanes_pwb)

    # Exact total each iteration (the applied deltas drift by ~1 ulp).
    lt = _log2_total_b(lcc, n_leaves)

    def body(pos_g, leaf_g, rand_bit_g):
        pr = _propose(c0, c1, par, inds, lcc, pos_g, leaf_g, rand_bit_g,
                      cfg, iota_n)
        ev = {k: pr[k] for k in _EV_IDS + ('l_a', 'l_b')}
        ev['ln_b'] = width(pr['inds_d'] | pr['inds_c'])
        ev['ln_a'] = width(pr['new_inds_b'] | pr['inds_e'])
        ev['dinds'] = pr['new_inds_b'] - pr['inds_b']
        return ev

    ev = _eval_chunked(body, pos, leaf, rand_bit, walk_chunk)
    if accept_rule == 'chained' and _chains_lt(cfg):
        valid = (ev['b'] != NULL) & (ev['a'] != NULL)
        accept, keep = _claim_chained(cfg, u, beta, lt, valid, ev)
    else:
        l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'],
                                         ev['l_b'], ev['ln_a'],
                                         ev['ln_b'])
        accept = _accept(cfg, u, beta, l_new, lt, ev)
        keep = _claim_disjoint(accept, ev)
    c0, c1, par, inds, lcc, _ = _apply_kept(c0, c1, par, inds, lcc, keep,
                                            ev, iota_n, walk_chunk)

    # Walk scheduling after claims ('advance': every walk moves up,
    # kept or not, exactly like the sequential sweep; see
    # _advance_walks for the convoy-breaking options).
    pos = _advance_walks(ev['a'], accept, keep, on_block)
    moves = moves + jnp.sum(jnp.ones_like(accept, jnp.int32),
                             dtype=jnp.int32)
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    # ---- Min tracking (trees are consistent at iteration boundaries)
    lt_new = _log2_total_b(lcc, n_leaves)
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
            min_inds, keys, pos, moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'walk_chunk',
                                         'uniform_log2', 'on_block',
                                         'accept_rule'))
def run_multiwalk(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
                  n_walks: int, pos, sparse_wb=None, log2_n_projs=None,
                  walk_chunk: int = 0, uniform_log2=None,
                  on_block='advance', accept_rule='round'):
    """Runs one multi-walk iteration per beta (P proposals per replica
    per iteration).  ``walk_chunk`` in (0, P) evaluates/applies walks in
    groups of that size (bit-identical; bounds compile-time temporaries
    on large networks).  ``accept_rule='chained'`` folds the Metropolis
    test into the claim scan against a running total (see
    :func:`_claim_chained`)."""
    n = batch.c0.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]

    def step(carry, beta):
        carry = _iter_multiwalk(carry, beta, log2d_w32, cfg, n_walks,
                                walk_chunk, iota_n, sparse_wb,
                                log2_n_projs, uniform_log2, on_block,
                                accept_rule)
        return carry, None

    carry = (batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
             batch.min_log2_total, batch.min_c0, batch.min_c1,
             batch.min_par, batch.min_inds, batch.keys, pos,
             jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, betas)
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par, min_inds,
     keys, pos, moves, applied) = carry
    lt = _log2_total_b(lcc, cfg.n_leaves)
    # Final min check + hyper refresh for extraction/audits
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
    return out, {'moves': moves, 'applied': applied, 'pos': pos}


def _iter_multiwalk_fw(carry, beta, update_slices, max_width, log2d_w32,
                       skip_wb, cfg, n_walks, walk_chunk, iota_n,
                       sparse_wb, log2_n_projs, uniform_log2=None,
                       on_block='advance', accept_rule='round'):
    """Finite-width multi-walk iteration: width-capped proposals against
    a shared per-lane slice set (+ optional greedy reslice-if-better,
    mirroring the lockstep FW engine's post-sweep cadence)."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _lcc_fw_b)

    (c0, c1, par, inds, lcc, width_pre, slices, min_lt, min_c0, min_c1,
     min_par, min_inds, min_slices, keys, pos, moves, applied) = carry
    n_leaves = cfg.n_leaves

    keys, leaf, rand_bit, u, (k_reslice,) = _draws(
        keys, n_leaves, n_walks, log2d_w32.dtype, 5)

    def width(lanes_pwb):
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs,
                                uniform_log2=uniform_log2))(lanes_pwb)

    lt = _log2_total_b(lcc, n_leaves)
    sl = slices[None, :, :]  # [1, W, B] broadcast over the walk group

    def body(pos_g, leaf_g, rand_bit_g):
        pr = _propose(c0, c1, par, inds, lcc, pos_g, leaf_g, rand_bit_g,
                      cfg, iota_n)
        ev = {k: pr[k] for k in _EV_IDS + ('l_a', 'l_b')}
        ev['new_width_b'] = width(pr['new_inds_b'])
        new_sliced_width_b = width(pr['new_inds_b'] & ~sl)
        ev['fits'] = new_sliced_width_b <= max_width + _WIDTH_EPS
        ev['ln_b'] = width((pr['inds_d'] | pr['inds_c']) | sl)
        ev['ln_a'] = width((pr['new_inds_b'] | pr['inds_e']) | sl)
        ev['dinds'] = pr['new_inds_b'] - pr['inds_b']
        return ev

    ev = _eval_chunked(body, pos, leaf, rand_bit, walk_chunk)
    if accept_rule == 'chained' and _chains_lt(cfg):
        valid = (ev['b'] != NULL) & (ev['a'] != NULL) & ev['fits']
        accept, keep = _claim_chained(cfg, u, beta, lt, valid, ev)
    else:
        l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'],
                                         ev['l_b'], ev['ln_a'],
                                         ev['ln_b'])
        accept = _accept(cfg, u, beta, l_new, lt, ev) & ev['fits']
        keep = _claim_disjoint(accept, ev)
    c0, c1, par, inds, lcc, width_pre = _apply_kept(
        c0, c1, par, inds, lcc, keep, ev, iota_n, walk_chunk,
        width_pre=width_pre)

    pos = _advance_walks(ev['a'], accept, keep, on_block)
    moves = moves + jnp.sum(jnp.ones_like(accept, jnp.int32),
                             dtype=jnp.int32)
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    # ---- Periodic greedy reslice-if-better (lockstep FW cadence) -------
    def do_reslice(args):
        slices_, lcc_ = args
        new_slices = _greedy_slices_b(c0, inds, width_pre, k_reslice,
                                      max_width, log2d_w32, skip_wb,
                                      sparse_wb, log2_n_projs,
                                      uniform_log2=uniform_log2)
        new_lcc = _lcc_fw_b(c0, c1, inds, new_slices, log2d_w32,
                            sparse_wb, log2_n_projs,
                            uniform_log2=uniform_log2)
        better = (_log2_total_b(new_lcc, n_leaves) <
                  _log2_total_b(lcc_, n_leaves))
        return (jnp.where(better[None, :], new_slices, slices_),
                jnp.where(better[None, :], new_lcc, lcc_))

    has_slices = jnp.any(slices != 0)
    slices, lcc = jax.lax.cond(update_slices & has_slices, do_reslice,
                               lambda x: x, (slices, lcc))

    lt_new = _log2_total_b(lcc, n_leaves)
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
            min_c1, min_par, min_inds, min_slices, keys, pos, moves,
            applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'walk_chunk',
                                         'uniform_log2', 'on_block',
                                         'accept_rule'))
def run_multiwalk_fw(batch, betas, update_slices_mask, max_width,
                     log2d_w32, skip_wb, cfg, n_walks: int, pos,
                     sparse_wb=None, log2_n_projs=None,
                     walk_chunk: int = 0, uniform_log2=None,
                     on_block='advance', accept_rule='round'):
    """Finite-width multi-walk: one iteration per beta.

    ``batch`` is a :class:`tnco_tpu.kernels.sa_finite_batched.SABatchFW`;
    ``update_slices_mask[i]`` turns on the greedy reslice at iteration i.
    """
    from tnco_tpu.kernels.sa_finite_batched import SABatchFW

    n = batch.c0.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]
    max_width = jnp.asarray(max_width, log2d_w32.dtype)

    def step(carry, x):
        beta, upd = x
        carry = _iter_multiwalk_fw(carry, beta, upd, max_width, log2d_w32,
                                   skip_wb, cfg, n_walks, walk_chunk,
                                   iota_n, sparse_wb, log2_n_projs,
                                   uniform_log2, on_block, accept_rule)
        return carry, None

    carry = (batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
             batch.width, batch.slices, batch.min_log2_total,
             batch.min_c0, batch.min_c1, batch.min_par, batch.min_inds,
             batch.min_slices, batch.keys, pos, jnp.int32(0),
             jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, (betas, update_slices_mask))
    (c0, c1, par, inds, lcc, width_pre, slices, min_lt, min_c0, min_c1,
     min_par, min_inds, min_slices, keys, pos, moves, applied) = carry
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
    return out, {'moves': moves, 'applied': applied, 'pos': pos}
