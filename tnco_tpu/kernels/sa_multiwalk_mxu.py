"""MXU multi-walk SA engine for very large networks.

Same synchronous multi-walk semantics as
:mod:`tnco_tpu.kernels.sa_multiwalk` (P concurrent leaf-to-root walks per
replica, Metropolis accepts against the shared total, pairwise-disjoint
application) — but every row gather and row write is a one-hot batched
matmul on the MXU instead of a masked pass over the ``[N, ...]`` state.

Why: on Sycamore-scale networks (N ~ 3000, W = 64 lanes) the masked
engines are compute-bound on ``[P, N, W, B]`` broadcasts (~5.5 ms per
masked pass at B=256, P=64) and XLA's gather/scatter lowering costs
~1.1 ms per call / 7.4 ms per scatter (docs/ROADMAP.md measurements).  A
batched GEMM ``[Q, N] x [N, F]`` over B lanes moves the same rows in
tens of microseconds of MXU time.

Exactness: MXU operands are bf16, so the state is stored as bf16 *piece
planes* — every 32-bit quantity split into four 8-bit pieces (node ids:
two pieces of ``id+1``; ``lcc`` float32 bitcast to uint32 first).  Each
piece is an integer in [0, 255], exactly representable in bf16; one-hot
rows are exactly 0/1; products are exact; float32 accumulation over a
one-hot row adds exact zeros to a single exact value.  Row *placement*
(the apply step) uses the same trick in reverse: kept rows are replaced
via ``placed = einsum(onehot, new_row_pieces)`` plus a written-row mask —
kept proposals touch pairwise-disjoint rows, so sums never collide.

The per-walk proposal math is shared with the masked multi-walk engine
(same draws, same widths, same accept rule, same conflict filter, and
float updates written as ``old + (new - old)``), so trajectories are
BIT-IDENTICAL to ``run_multiwalk`` — enforced by
tests/test_sa_multiwalk.py::test_mxu_bit_identical.

Reference semantics: include/tnco/optimize/infinite_memory/
optimizer.hpp:90-221 (proposal geometry / acceptance), as for the other
engines.
"""

import functools as fts
import os

import jax
import jax.numpy as jnp

from tnco_tpu.kernels.sa_batched import (SABatch, _log2_total_b, _width_b,
                                         compute_hyper_b)
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.kernels.sa_multiwalk import (NULL, _accept, _claim_disjoint,
                                           _draws, _eval_chunked)
from tnco_tpu.ops import costs as costs_ops

__all__ = ['run_multiwalk_mxu', 'run_multiwalk_fw_mxu']

_BF = jnp.bfloat16

# Feature-plane layout of the packed state R [N, F, B]:
#   [par(2) | c0(2) | c1(2) | lcc(4) | inds(4W)]
# The finite-width variant inserts a width_pre f32 block before inds:
#   [par(2) | c0(2) | c1(2) | lcc(4) | wpre(4) | inds(4W)]
_PAR, _C0, _C1, _LCC = 0, 2, 4, 6
_INDS = 10
_WPRE = 10
_INDS_FW = 14


def _id_pieces(x):
    """int32 ids in {-1 .. 65534} -> two bf16 planes of ``id + 1``."""
    y = (x + 1).astype(jnp.uint32)
    return ((y & 255).astype(_BF), (y >> 8).astype(_BF))


def _id_from(g0, g1):
    """f32 gather outputs -> int32 ids (all-zero one-hot row -> NULL)."""
    return (g0 + 256.0 * g1).astype(jnp.int32) - 1


def _u32_pieces(x):
    return tuple(((x >> (8 * k)) & jnp.uint32(255)).astype(_BF)
                 for k in range(4))


def _u32_from(gs):
    out = gs[0].astype(jnp.uint32)
    for k in (1, 2, 3):
        out = out | (gs[k].astype(jnp.uint32) << (8 * k))
    return out


def _f32_pieces(x):
    return _u32_pieces(jax.lax.bitcast_convert_type(x, jnp.uint32))


def _f32_from(gs):
    return jax.lax.bitcast_convert_type(_u32_from(gs), jnp.float32)


def pack_state(c0, c1, par, lcc, inds, width=None):
    """[N,B] node arrays + [N,W,B] lanes -> piece planes [N, F, B].

    With ``width`` (finite-width pre-slicing widths, [N,B] f32) the
    layout gains the wpre block between lcc and inds.
    """
    n = c0.shape[0]
    if n >= 65535:
        raise ValueError("MXU engine supports trees up to 65534 nodes.")
    planes = list(_id_pieces(par)) + list(_id_pieces(c0)) + \
        list(_id_pieces(c1)) + list(_f32_pieces(lcc))
    if width is not None:
        planes += list(_f32_pieces(width))
    n_head = len(planes)
    for k in range(4):
        planes.append(
            ((inds >> (8 * k)) & jnp.uint32(255)).astype(_BF))
    # inds pieces interleave as [W,4] -> flatten to 4W planes
    head = jnp.stack(planes[:n_head], axis=1)         # [N, 10|14, B]
    tail = jnp.stack(planes[n_head:], axis=2)         # [N, W, 4, B]
    tail = tail.reshape(tail.shape[0], -1, tail.shape[-1])
    return jnp.concatenate([head, tail], axis=1)


def unpack_state(R, with_width=False):
    """Inverse of :func:`pack_state`."""
    gs = R.astype(jnp.float32)
    par = _id_from(gs[:, _PAR], gs[:, _PAR + 1])
    c0 = _id_from(gs[:, _C0], gs[:, _C0 + 1])
    c1 = _id_from(gs[:, _C1], gs[:, _C1 + 1])
    lcc = _f32_from([gs[:, _LCC + k] for k in range(4)])
    i0 = _INDS_FW if with_width else _INDS
    w = (R.shape[1] - i0) // 4
    tail = gs[:, i0:].reshape(gs.shape[0], w, 4, gs.shape[-1])
    inds = _u32_from([tail[:, :, k] for k in range(4)])
    if not with_width:
        return c0, c1, par, lcc, inds
    width = _f32_from([gs[:, _WPRE + k] for k in range(4)])
    return c0, c1, par, lcc, inds, width


def _lanes_from(gf, sl):
    """Gathered f32 features -> uint32 lanes for slice ``sl``."""
    q, _, b = gf.shape
    tail = gf[:, sl].reshape(q, -1, 4, b)
    return _u32_from([tail[:, :, k] for k in range(4)])


def _oh(idx, n):
    """[Q, B] row ids -> bf16 one-hot [B, Q, N] (NULL -> all-zero).

    Batch-leading so the GEMMs consume it without operand transposes.
    """
    iota = jnp.arange(n, dtype=jnp.int32)
    return (iota[None, None, :] == idx.T[:, :, None]).astype(_BF)


_GATHER_IMPL = os.environ.get('TNCO_TPU_MXU_GATHER', 'onehot')


def _gather(oh, Rb):
    """One-hot rows [B,Q,N] x planes [B,N,F] -> exact f32 [Q,F,B].

    ``Rb`` is the batch-leading view of the state, transposed ONCE per
    iteration — with lane-minor operands XLA re-transposed the whole
    state around every dot (the dominant per-iteration cost).
    """
    g = jnp.einsum('bqn,bnf->bqf', oh, Rb,
                   preferred_element_type=jnp.float32)
    return jnp.transpose(g, (1, 2, 0))


def _gather_rows(idx, Rb):
    """Row gather [Q,B] ids from [B,N,F] -> exact f32 [Q,F,B].

    Implementation is selectable via TNCO_TPU_MXU_GATHER: 'onehot'
    (MXU GEMM against a materialized one-hot — exact: one nonzero per
    row) or 'xla' (native take_along_axis — exact trivially).  Both
    return NULL rows as zeros, so values are identical either way.
    """
    if _GATHER_IMPL == 'xla':
        safe = jnp.maximum(idx, 0)                      # [Q, B]
        g = jnp.take_along_axis(
            Rb, safe.T[:, :, None], axis=1)             # [B, Q, F]
        g = jnp.where((idx > NULL).T[:, :, None], g, _BF(0))
        return jnp.transpose(g, (1, 2, 0)).astype(jnp.float32)
    return _gather(_oh(idx, Rb.shape[1]), Rb)


def _place(Rb, ev, keep, n):
    """Apply kept proposals: full-row placement GEMM for B and A,
    par-plane-only placement for C and E (their other features never
    change, and the old bf16 planes are bit-identical to a re-written
    round-trip, so the narrow write is exact and ~halves placement
    traffic).  Kept walks touch pairwise-disjoint rows, so sums never
    collide."""
    keep2 = jnp.tile(keep, (2, 1))

    # Full rows: targets {B, A}.
    oh2 = _oh(jnp.concatenate([ev['b'], ev['a']]), n)
    v2 = jnp.concatenate([ev['v_b'], ev['v_a']])
    v2 = jnp.where(keep2[:, None, :], v2, _BF(0))
    v2b = jnp.transpose(v2, (2, 0, 1))                # [B, 2P, F]
    placed = jnp.einsum('bqn,bqf->bnf', oh2, v2b,
                        preferred_element_type=jnp.float32)
    written = jnp.einsum('bqn,bq->bn', oh2, keep2.T.astype(_BF),
                         preferred_element_type=jnp.float32) > 0.5

    # Par planes only: C's parent becomes B, E's parent becomes A.
    ohce = _oh(jnp.concatenate([ev['c'], ev['e']]), n)
    v_c = jnp.stack(_id_pieces(ev['b']), axis=1)      # [P, 2, B]
    v_e = jnp.stack(_id_pieces(ev['a']), axis=1)
    vce = jnp.concatenate([v_c, v_e])
    vce = jnp.where(keep2[:, None, :], vce, _BF(0))
    vceb = jnp.transpose(vce, (2, 0, 1))              # [B, 2P, 2]
    placed_par = jnp.einsum('bqn,bqf->bnf', ohce, vceb,
                            preferred_element_type=jnp.float32)
    written_ce = jnp.einsum('bqn,bq->bn', ohce, keep2.T.astype(_BF),
                            preferred_element_type=jnp.float32) > 0.5

    Rb_new = jnp.where(written[:, :, None], placed.astype(_BF), Rb)
    par_new = jnp.where(written_ce[:, :, None], placed_par.astype(_BF),
                        Rb_new[:, :, _PAR:_PAR + 2])
    Rb_new = jnp.concatenate([par_new, Rb_new[:, :, _PAR + 2:]], axis=2)
    return jnp.transpose(Rb_new, (1, 2, 0))


def _iter_mxu(carry, beta, log2d_w32, cfg: SweepConfig, n_walks, n,
              sparse_wb, log2_n_projs, walk_chunk=0):
    (R, minR, min_lt, keys, pos, moves, applied) = carry
    n_leaves = cfg.n_leaves
    f = R.shape[1]
    ii = slice(_INDS, f)

    keys, leaf, rand_bit, u, _ = _draws(keys, n_leaves, n_walks,
                                        log2d_w32.dtype, 4)

    def width(lanes_pwb):
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs))(lanes_pwb)

    lcc = _f32_from([R[:, _LCC + k].astype(jnp.float32)
                     for k in range(4)])
    lt = _log2_total_b(lcc, n_leaves)
    Rb = jnp.transpose(R, (2, 0, 1))  # [B, N, F], once per iteration

    def row_pieces(c0_n, c1_n, par_n, lcc_n, inds_n):
        planes = list(_id_pieces(par_n)) + list(_id_pieces(c0_n)) + \
            list(_id_pieces(c1_n)) + list(_f32_pieces(lcc_n))
        head = jnp.stack(planes, axis=1)              # [P, 10, B]
        tail = jnp.stack(
            [((inds_n >> (8 * k)) & jnp.uint32(255)).astype(_BF)
             for k in range(4)], axis=2)              # [P, W, 4, B]
        tail = tail.reshape(tail.shape[0], -1, tail.shape[-1])
        return jnp.concatenate([head.astype(_BF), tail], axis=1)

    def eval_body(pos_g, leaf_g, rand_bit_g):
        """Gather rounds + proposal math for one walk group.

        One-hot GEMM gathers are exact (one nonzero per row), so group
        size does not change any value — ``walk_chunk`` only bounds the
        live one-hot temporaries (the B>=1024 / P=256 XLA compile-stall
        fix, mirroring the masked engine's walk_chunk).
        """
        p_g = pos_g.shape[0]

        # Round 1: restart finished walks at a fresh leaf.
        g1 = _gather_rows(jnp.concatenate([pos_g, leaf_g]),
                          Rb[:, :, _PAR:_PAR + 2])
        par_pos = _id_from(g1[:p_g, 0], g1[:p_g, 1])
        new_pos = _id_from(g1[p_g:, 0], g1[p_g:, 1])
        at_boundary = (pos_g == NULL) | (par_pos == NULL)
        b = jnp.where(at_boundary, new_pos, pos_g)

        # Round 2: everything at B.
        gb = _gather_rows(b, Rb)
        a = _id_from(gb[:, _PAR], gb[:, _PAR + 1])
        c0b = _id_from(gb[:, _C0], gb[:, _C0 + 1])
        c1b = _id_from(gb[:, _C1], gb[:, _C1 + 1])
        l_b = _f32_from([gb[:, _LCC + k] for k in range(4)])
        inds_b = _lanes_from(gb, ii)

        # Round 3: everything at A and B's children.
        g3 = _gather_rows(jnp.concatenate([a, c0b, c1b]), Rb)
        ga, g0, gc1 = g3[:p_g], g3[p_g:2 * p_g], g3[2 * p_g:]
        c0a = _id_from(ga[:, _C0], ga[:, _C0 + 1])
        c1a = _id_from(ga[:, _C1], ga[:, _C1 + 1])
        l_a = _f32_from([ga[:, _LCC + k] for k in range(4)])
        inds_a = _lanes_from(ga, ii)
        inds0 = _lanes_from(g0, ii)
        inds1 = _lanes_from(gc1, ii)
        c = jnp.where(c0a == b, c1a, c0a)

        # Round 4: C's index set (indices only — C's other features are
        # never read, and its only update is the par-plane write below).
        inds_c = _lanes_from(_gather_rows(c, Rb[:, :, ii]),
                             slice(0, f - _INDS))

        # Shared-index pick + hyper-on-the-fly (same math as masked).
        i0 = jnp.any(inds0 & inds_c, axis=1)
        i1 = jnp.any(inds1 & inds_c, axis=1)
        take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1),
                          rand_bit_g, i0)
        d = jnp.where(take0, c0b, c1b)
        e = jnp.where(take0, c1b, c0b)
        t0m = take0[:, None, :]
        inds_d = jnp.where(t0m, inds0, inds1)
        inds_e = jnp.where(t0m, inds1, inds0)
        hyp_a = inds_a & inds_b & inds_c
        hyp_b = inds_b & inds0 & inds1
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        ln_b = width(inds_d | inds_c)
        ln_a = width(new_inds_b | inds_e)

        # New full-row values for B and A (floats written as
        # old + (new - old) so the trajectory matches the masked engine
        # bit for bit).
        v_b = row_pieces(jnp.where(c0b == e, c, c0b),
                         jnp.where(c1b == e, c, c1b), a,
                         l_b + (ln_b - l_b), new_inds_b)
        par_a = _id_from(ga[:, _PAR], ga[:, _PAR + 1])
        v_a = row_pieces(jnp.where(c0a == c, e, c0a),
                         jnp.where(c1a == c, e, c1a), par_a,
                         l_a + (ln_a - l_a), inds_a)
        return dict(a=a, b=b, c=c, d=d, e=e, l_a=l_a, l_b=l_b,
                    ln_a=ln_a, ln_b=ln_b, v_b=v_b, v_a=v_a)

    ev = _eval_chunked(eval_body, pos, leaf, rand_bit, walk_chunk)
    l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'], ev['l_b'],
                                     ev['ln_a'], ev['ln_b'])
    accept = _accept(cfg, u, beta, l_new, lt, ev)
    keep = _claim_disjoint(accept, ev)

    R = _place(Rb, ev, keep, n)

    pos = ev['a']
    moves = moves + jnp.sum(jnp.ones_like(accept, jnp.int32),
                             dtype=jnp.int32)
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    # ---- Min tracking -------------------------------------------------
    lcc = _f32_from([R[:, _LCC + k].astype(jnp.float32)
                     for k in range(4)])
    lt_new = _log2_total_b(lcc, n_leaves)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)
    minR = jax.lax.cond(
        jnp.any(improved),
        lambda mR: jnp.where(improved[None, None, :], R, mR),
        lambda mR: mR, minR)

    return (R, minR, min_lt, keys, pos, moves, applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'walk_chunk'))
def run_multiwalk_mxu(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
                      n_walks: int, pos, sparse_wb=None,
                      log2_n_projs=None, walk_chunk: int = 0):
    """One MXU multi-walk iteration per beta; same contract as
    :func:`tnco_tpu.kernels.sa_multiwalk.run_multiwalk` (bit-identical
    trajectories).  ``walk_chunk`` bounds the live one-hot temporaries
    (identical results for every chunking)."""
    n = batch.c0.shape[0]
    R = pack_state(batch.c0, batch.c1, batch.par, batch.lcc, batch.inds)
    minR = pack_state(batch.min_c0, batch.min_c1, batch.min_par,
                      jnp.zeros_like(batch.lcc), batch.min_inds)

    def step(carry, beta):
        return _iter_mxu(carry, beta, log2d_w32, cfg, n_walks, n,
                         sparse_wb, log2_n_projs, walk_chunk), None

    carry = (R, minR, batch.min_log2_total, batch.keys, pos,
             jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, betas)
    (R, minR, min_lt, keys, pos, moves, applied) = carry
    c0, c1, par, lcc, inds = unpack_state(R)
    min_c0, min_c1, min_par, _, min_inds = unpack_state(minR)
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
    return out, {'moves': moves, 'applied': applied, 'pos': pos}


def _iter_fw_mxu(carry, beta, update_slices, max_width, log2d_w32,
                 skip_wb, cfg, n_walks, n, sparse_wb, log2_n_projs,
                 walk_chunk=0):
    """Finite-width MXU iteration: width-capped proposals against the
    shared per-lane slice set + periodic greedy reslice-if-better
    (bit-identical to the masked FW multi-walk engine)."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _lcc_fw_b)

    (R, slices, minR, min_slices, min_lt, keys, pos, moves,
     applied) = carry
    n_leaves = cfg.n_leaves
    f = R.shape[1]
    ii = slice(_INDS_FW, f)

    keys, leaf, rand_bit, u, (k_reslice,) = _draws(
        keys, n_leaves, n_walks, log2d_w32.dtype, 5)

    def width(lanes_pwb):
        return jax.vmap(
            lambda lw: _width_b(lw, log2d_w32, sparse_wb=sparse_wb,
                                log2_n_projs=log2_n_projs))(lanes_pwb)

    lcc = _f32_from([R[:, _LCC + k].astype(jnp.float32)
                     for k in range(4)])
    lt = _log2_total_b(lcc, n_leaves)
    sl = slices[None, :, :]  # [1, W, B] broadcast over P
    Rb = jnp.transpose(R, (2, 0, 1))  # [B, N, F], once per iteration

    def row_pieces(c0_n, c1_n, par_n, lcc_n, wpre_n, inds_n):
        planes = list(_id_pieces(par_n)) + list(_id_pieces(c0_n)) + \
            list(_id_pieces(c1_n)) + list(_f32_pieces(lcc_n)) + \
            list(_f32_pieces(wpre_n))
        head = jnp.stack(planes, axis=1)              # [P, 14, B]
        tail = jnp.stack(
            [((inds_n >> (8 * k)) & jnp.uint32(255)).astype(_BF)
             for k in range(4)], axis=2)
        tail = tail.reshape(tail.shape[0], -1, tail.shape[-1])
        return jnp.concatenate([head.astype(_BF), tail], axis=1)

    def eval_body(pos_g, leaf_g, rand_bit_g):
        """Gather rounds + width-capped proposal math for one walk
        group (exact for any ``walk_chunk``; see the IM engine)."""
        p_g = pos_g.shape[0]

        g1 = _gather_rows(jnp.concatenate([pos_g, leaf_g]),
                          Rb[:, :, _PAR:_PAR + 2])
        par_pos = _id_from(g1[:p_g, 0], g1[:p_g, 1])
        new_pos = _id_from(g1[p_g:, 0], g1[p_g:, 1])
        at_boundary = (pos_g == NULL) | (par_pos == NULL)
        b = jnp.where(at_boundary, new_pos, pos_g)

        gb = _gather_rows(b, Rb)
        a = _id_from(gb[:, _PAR], gb[:, _PAR + 1])
        c0b = _id_from(gb[:, _C0], gb[:, _C0 + 1])
        c1b = _id_from(gb[:, _C1], gb[:, _C1 + 1])
        l_b = _f32_from([gb[:, _LCC + k] for k in range(4)])
        w_b = _f32_from([gb[:, _WPRE + k] for k in range(4)])
        inds_b = _lanes_from(gb, ii)

        g3 = _gather_rows(jnp.concatenate([a, c0b, c1b]), Rb)
        ga, g0, gc1 = g3[:p_g], g3[p_g:2 * p_g], g3[2 * p_g:]
        c0a = _id_from(ga[:, _C0], ga[:, _C0 + 1])
        c1a = _id_from(ga[:, _C1], ga[:, _C1 + 1])
        l_a = _f32_from([ga[:, _LCC + k] for k in range(4)])
        inds_a = _lanes_from(ga, ii)
        inds0 = _lanes_from(g0, ii)
        inds1 = _lanes_from(gc1, ii)
        c = jnp.where(c0a == b, c1a, c0a)

        # C: indices only (its sole update is the par-plane write).
        inds_c = _lanes_from(_gather_rows(c, Rb[:, :, ii]),
                             slice(0, f - _INDS_FW))

        i0 = jnp.any(inds0 & inds_c, axis=1)
        i1 = jnp.any(inds1 & inds_c, axis=1)
        take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1),
                          rand_bit_g, i0)
        d = jnp.where(take0, c0b, c1b)
        e = jnp.where(take0, c1b, c0b)
        t0m = take0[:, None, :]
        inds_d = jnp.where(t0m, inds0, inds1)
        inds_e = jnp.where(t0m, inds1, inds0)
        hyp_a = inds_a & inds_b & inds_c
        hyp_b = inds_b & inds0 & inds1
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        new_width_b = width(new_inds_b)
        new_sliced_width_b = width(new_inds_b & ~sl)
        fits = new_sliced_width_b <= max_width + _WIDTH_EPS
        ln_b = width((inds_d | inds_c) | sl)
        ln_a = width((new_inds_b | inds_e) | sl)

        v_b = row_pieces(jnp.where(c0b == e, c, c0b),
                         jnp.where(c1b == e, c, c1b), a,
                         l_b + (ln_b - l_b), w_b + (new_width_b - w_b),
                         new_inds_b)
        par_a = _id_from(ga[:, _PAR], ga[:, _PAR + 1])
        w_a = _f32_from([ga[:, _WPRE + k] for k in range(4)])
        v_a = row_pieces(jnp.where(c0a == c, e, c0a),
                         jnp.where(c1a == c, e, c1a), par_a,
                         l_a + (ln_a - l_a), w_a, inds_a)
        return dict(a=a, b=b, c=c, d=d, e=e, l_a=l_a, l_b=l_b,
                    ln_a=ln_a, ln_b=ln_b, fits=fits, v_b=v_b, v_a=v_a)

    ev = _eval_chunked(eval_body, pos, leaf, rand_bit, walk_chunk)
    l_new = costs_ops.new_total_log2(lt[None, :], ev['l_a'], ev['l_b'],
                                     ev['ln_a'], ev['ln_b'])
    accept = _accept(cfg, u, beta, l_new, lt, ev) & ev['fits']
    keep = _claim_disjoint(accept, ev)

    R = _place(Rb, ev, keep, n)

    pos = ev['a']
    moves = moves + jnp.sum(jnp.ones_like(accept, jnp.int32),
                             dtype=jnp.int32)
    applied = applied + jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)

    # ---- Periodic greedy reslice-if-better (lockstep FW cadence) ------
    def do_reslice(args):
        R_, slices_ = args
        c0_, c1_, _, lcc_, inds_, width_ = unpack_state(R_,
                                                        with_width=True)
        new_slices = _greedy_slices_b(c0_, inds_, width_, k_reslice,
                                      max_width, log2d_w32, skip_wb,
                                      sparse_wb, log2_n_projs)
        new_lcc = _lcc_fw_b(c0_, c1_, inds_, new_slices, log2d_w32,
                            sparse_wb, log2_n_projs)
        better = (_log2_total_b(new_lcc, n_leaves) <
                  _log2_total_b(lcc_, n_leaves))
        lcc_sel = jnp.where(better[None, :], new_lcc, lcc_)
        lcc_block = jnp.stack(_f32_pieces(lcc_sel), axis=1)
        R_ = jnp.concatenate(
            [R_[:, :_LCC], lcc_block, R_[:, _LCC + 4:]], axis=1)
        return R_, jnp.where(better[None, :], new_slices, slices_)

    has_slices = jnp.any(slices != 0)
    R, slices = jax.lax.cond(update_slices & has_slices, do_reslice,
                             lambda x: x, (R, slices))

    lcc = _f32_from([R[:, _LCC + k].astype(jnp.float32)
                     for k in range(4)])
    lt_new = _log2_total_b(lcc, n_leaves)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)

    def snap(args):
        mR, msl = args
        return (jnp.where(improved[None, None, :], R, mR),
                jnp.where(improved[None, :], slices, msl))

    minR, min_slices = jax.lax.cond(jnp.any(improved), snap,
                                    lambda x: x, (minR, min_slices))

    return (R, slices, minR, min_slices, min_lt, keys, pos, moves,
            applied)


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'walk_chunk'))
def run_multiwalk_fw_mxu(batch, betas, update_slices_mask, max_width,
                         log2d_w32, skip_wb, cfg, n_walks: int, pos,
                         sparse_wb=None, log2_n_projs=None,
                         walk_chunk: int = 0):
    """Finite-width MXU multi-walk: same contract as
    :func:`tnco_tpu.kernels.sa_multiwalk.run_multiwalk_fw`
    (bit-identical trajectories; ``walk_chunk`` changes no values)."""
    from tnco_tpu.kernels.sa_finite_batched import SABatchFW

    n = batch.c0.shape[0]
    max_width = jnp.asarray(max_width, log2d_w32.dtype)
    R = pack_state(batch.c0, batch.c1, batch.par, batch.lcc, batch.inds,
                   width=batch.width)
    minR = pack_state(batch.min_c0, batch.min_c1, batch.min_par,
                      jnp.zeros_like(batch.lcc), batch.min_inds,
                      width=jnp.zeros_like(batch.width))

    def step(carry, x):
        beta, upd = x
        return _iter_fw_mxu(carry, beta, upd, max_width, log2d_w32,
                            skip_wb, cfg, n_walks, n, sparse_wb,
                            log2_n_projs, walk_chunk), None

    carry = (R, batch.slices, minR, batch.min_slices,
             batch.min_log2_total, batch.keys, pos, jnp.int32(0),
             jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, (betas, update_slices_mask))
    (R, slices, minR, min_slices, min_lt, keys, pos, moves,
     applied) = carry
    c0, c1, par, lcc, inds, width_pre = unpack_state(R, with_width=True)
    min_c0, min_c1, min_par, _, min_inds, _ = unpack_state(
        minR, with_width=True)
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
