"""Synchronous full-tree sweep SA engine: a proposal at EVERY node.

The multi-walk engines amortize row traffic over ``P`` concurrent walks,
but their row accesses still cost O(N) (masked reductions) or O(N/128)
(walker block sweeps) *per walk*.  This engine removes the walk
bookkeeping entirely: every internal node ``B`` proposes its uncle swap
**simultaneously** each round (the root's proposal is always rejected —
it has no parent), so ``b`` is the row index itself and most reads are
plain *aligned* slices.

Semantics are the natural completion of the multi-walk family: the
per-node proposal math (D-shares-index-with-C rule, on-the-fly hyper
rows, log2-domain acceptance) is identical to
:mod:`tnco_tpu.kernels.sa_multiwalk`; only the conflict filter and the
default acceptance calibration differ.  The engine default is
``prob_kind='mh_local'`` — Metropolis on the PAIR cost ratio
``(2^ln_a + 2^ln_b) / (2^l_a + 2^l_b)`` instead of the reference's
totals ratio: with ~N/2 simultaneous proposals per round the totals
rule accepts every move more than ~beta^-1 * 17 bits below the running
total freely in BOTH directions (f32 cannot even represent smaller
deltas against the total), and that free uphill churn stalls deep
networks ~20 bits above the sequential arm.  The pair rule anneals
every scale of the tree simultaneously (measured: Sycamore m=20
best 63.9 vs 83-87 with the totals rule at equal wall-clock; the
sequential reference arm reaches ~63.7).  ``prob_kind='mh'`` (the
reference totals rule, computed via the precision-safe
``costs.delta_log2_local``) remains available for parity studies.

With ~N/2 concurrent proposals a sequential priority
scan is impossible, so disjointness is resolved by one round of
random-priority independent-set selection (Luby-style): every accepted
node draws a unique priority and is applied iff it beats every
*accepted* proposal in its conflict neighborhood (12 candidates:
parent, sibling, both children, grandparent, uncle, both nephews, all
four grandchildren).  Winners' ``{A,B,C,D,E}`` sets are pairwise
disjoint (mutual strict comparison), so the simultaneous application
equals some sequential application order.

TPU-first implementation (v2 — the "pull" formulation):

- Internal layout is ``[planes, B, N]`` with nodes on LANES: every
  aligned access is a slice, and every irregular read goes through
  :func:`tnco_tpu.kernels.pallas_gather.gather_gbn` (lane-wise
  ``dynamic_gather``; XLA's lane-varying gather lowers to a ~11 ns/row
  scalar loop, which made irregular reads ~80% of v1's iteration).
- There are NO scatters: the apply step is reformulated as *pulls* —
  each row resolves its own role (kept proposer B, parent A of a kept
  B, sibling C reparenting to B, moved child E reparenting to A) by
  looking up its parent / children / sibling rows at aligned id
  arrays; role exclusivity is exactly the Luby disjointness.
- Widths use an integer-popcount fast path when every index dimension
  is equal (``uniform_log2``): ``width = log2(dim) * popcount`` — for
  dim 2 bitwise-identical to the order-pinned pairwise tree, ulp-close
  otherwise, and ~12x cheaper than the 32x bit-plane expansion.

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
import numpy as np

from tnco_tpu.kernels.pallas_gather import gather_gbn
from tnco_tpu.kernels.sa_batched import SABatch, compute_hyper_b
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import costs as costs_ops

__all__ = ['run_fullsweep', 'run_fullsweep_fw', 'uniform_log2_dim']

NULL = -1
# Same scaled-sum floor as ops.costs: clamps the log argument when a
# move removes (nearly) all of the pair / total cost.
_SCALED_FLOOR = 2.0**-60
# Priority layout: bit 31 clear (sign), bits 30..15 random, bits 14..0
# the node id — strictly unique per (node, replica), so the neighbor
# comparison below never ties and the kept sets are provably disjoint.
_PRIO_ID_BITS = 15
_PRIO_RAND_MASK = (0xFFFFFFFF << _PRIO_ID_BITS) & 0x7FFFFFFF


def uniform_log2_dim(log2_dims) -> float | None:
    """The common log2 dim if every (unpadded) index dim is equal.

    Host-side helper: pass ``ContractionTree.log2_dims_array`` (the
    UNPADDED per-index log2 dims).  Returns None when dims differ (the
    engine then uses the exact bit-plane width path).
    """
    a = np.asarray(log2_dims, dtype=np.float64)
    if a.size == 0:
        return 0.0
    if np.all(a == a.flat[0]):
        return float(a.flat[0])
    return None


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _split_f(x):
    """float array -> ``[k, ...]`` u32 planes (k=1 f32, k=2 f64)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    if u.ndim == x.ndim:
        return u[None]
    return jnp.moveaxis(u, -1, 0)


def _join_f(planes, dtype):
    """Inverse of :func:`_split_f` (planes ``[k, ...]``)."""
    if planes.shape[0] == 1:
        return jax.lax.bitcast_convert_type(planes[0], dtype)
    return jax.lax.bitcast_convert_type(
        jnp.moveaxis(planes, 0, -1), dtype)


def _nk(dtype):
    return 2 if jnp.dtype(dtype).itemsize == 8 else 1


def _pack(c0, c1, par, inds, lcc, width=None):
    """``[N, B]`` / ``[N, W, B]`` arrays -> stacked ``u32 [F, B, N]``.

    Plane layout: ``[0:W)`` inds; c0, c1, par; lcc (1 or 2 planes);
    optionally the FW pre-slicing width (1 or 2 planes).
    """
    planes = [jnp.transpose(inds, (1, 2, 0))]
    for h in (c0, c1, par):
        planes.append(_u32(h.T)[None])
    planes.append(_split_f(lcc.T))
    if width is not None:
        planes.append(_split_f(width.T))
    return jnp.concatenate(planes, axis=0)


def _unpack(S, w, dtype, fw=False):
    nk = _nk(dtype)
    inds = jnp.transpose(S[:w], (2, 0, 1))                  # [N, W, B]
    c0 = _i32(S[w]).T
    c1 = _i32(S[w + 1]).T
    par = _i32(S[w + 2]).T
    lcc = _join_f(S[w + 3:w + 3 + nk], dtype).T
    if not fw:
        return c0, c1, par, inds, lcc
    width = _join_f(S[w + 3 + nk:w + 3 + 2 * nk], dtype).T
    return c0, c1, par, inds, lcc, width


def _draws(keys, ni, dtype):
    """Per-replica draws, shaped ``[B, NI]``: accept uniforms plus one
    bits stream carrying the D/E tie bit (bit 31) and the conflict
    priority (bits 30..15)."""
    split = jax.vmap(lambda k: tuple(jax.random.split(k, 3)))
    keys, k_u, k_bits = split(keys)
    u = jax.vmap(lambda k: jax.random.uniform(k, (ni,), dtype=dtype))(k_u)
    bits = jax.vmap(lambda k: jax.random.bits(k, (ni,)))(k_bits)
    return keys, u, bits


def _width_bn(lanes_wbn, log2d_w32, uniform_log2, dtype, *,
              sparse_w=None, log2_n_projs=None):
    """Width of ``uint32 [W, ...]`` lane sets -> ``[...]``.

    Fast path (``uniform_log2`` static): integer popcount times the
    common log2 dim — exact for power-of-two dims, ulp-accurate
    otherwise.  Fallback: the same (w*32+s)-ordered pairwise-halving
    tree as ``sa_batched._width_b`` (bit-plane expansion).
    """
    if sparse_w is not None:
        sp = sparse_w.reshape((-1,) + (1,) * (lanes_wbn.ndim - 1))
        dense = _width_bn(lanes_wbn & ~sp, log2d_w32, uniform_log2,
                          dtype)
        sparse = _width_bn(lanes_wbn & sp, log2d_w32, uniform_log2,
                           dtype)
        return dense + jnp.minimum(sparse, log2_n_projs)
    if uniform_log2 is not None:
        pc = jnp.sum(jax.lax.population_count(lanes_wbn).astype(
            jnp.int32), axis=0)
        return pc.astype(dtype) * jnp.asarray(uniform_log2, dtype)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    sh = shifts.reshape((1, 32) + (1,) * (lanes_wbn.ndim - 1))
    bits = ((lanes_wbn[:, None] >> sh) & jnp.uint32(1)).astype(dtype)
    w = lanes_wbn.shape[0]
    ld = log2d_w32.reshape((w, 32) + (1,) * (lanes_wbn.ndim - 1))
    terms = (bits * ld).reshape((w * 32,) + lanes_wbn.shape[1:])
    n = w * 32
    p = 1 << (n - 1).bit_length() if n > 1 else 1
    if p != n:
        terms = jnp.concatenate(
            [terms, jnp.zeros((p - n,) + terms.shape[1:], terms.dtype)],
            axis=0)
    while terms.shape[0] > 1:
        h = terms.shape[0] // 2
        terms = terms[:h] + terms[h:]
    return terms[0]


def _log2_total_bn(lcc_bn):
    """log2 of the summed linear-domain costs, per replica ``[B]``.

    Max-shifted pairwise-halving tree over the last axis (same halving
    pairing as ``costs.log2_total_from_lcc``; layouts differ so
    cross-engine bit-identity is not claimed — the fullsweep engine is
    audited against exact host recomputes instead).
    """
    m = jnp.max(lcc_bn, axis=-1, keepdims=True)
    t = jnp.exp2(lcc_bn - m)
    n = t.shape[-1]
    p = 1 << (n - 1).bit_length() if n > 1 else 1
    if p != n:
        t = jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (p - n,), t.dtype)], axis=-1)
    while t.shape[-1] > 1:
        h = t.shape[-1] // 2
        t = t[..., :h] + t[..., h:]
    return (m + jnp.log2(t))[..., 0]


def _propose(S, u_bits, cfg: SweepConfig, log2d_w32, uniform_log2,
             dtype, sparse_w, log2_n_projs, interpret, slices_wb=None,
             width_plane=False):
    """Aligned + pulled proposal evaluation at every internal node.

    Returns the per-proposal ``ev`` dict shaped ``[B, NI]`` (ids,
    costs) / ``[W, B, NI]`` (lane sets), plus the ``[B, 12*NI]`` Luby
    neighbor-id table.
    """
    w = cfg.n_lanes
    nl = cfg.n_leaves
    nk = _nk(dtype)
    n = S.shape[2]
    b_dim = S.shape[1]
    ni = n - nl
    rand_bit = (u_bits >> jnp.uint32(31)).astype(bool)

    b_ids = jnp.broadcast_to(jnp.arange(nl, n, dtype=jnp.int32)[None],
                             (b_dim, ni))
    inds_b = S[:w, :, nl:]
    c0b = _i32(S[w, :, nl:])
    c1b = _i32(S[w + 1, :, nl:])
    a = _i32(S[w + 2, :, nl:])
    l_b = _join_f(S[w + 3:w + 3 + nk, :, nl:], dtype)

    # Pull 1: full rows at the parent.
    ra = gather_gbn(S[:w + 3 + nk], a, interpret=interpret)
    inds_a = ra[:w]
    c0a = _i32(ra[w])
    c1a = _i32(ra[w + 1])
    gp = jnp.where(a == NULL, NULL, _i32(ra[w + 2]))
    l_a = _join_f(ra[w + 3:w + 3 + nk], dtype)
    c = jnp.where(c0a == b_ids, c1a, c0a)

    # Pull 2: rows at sibling, both children, grandparent (one call).
    ids2 = jnp.concatenate([c, c0b, c1b, gp], axis=1)
    r2 = gather_gbn(S[:w + 2], ids2, interpret=interpret)
    rc, r0, r1, rgp = (r2[:, :, k * ni:(k + 1) * ni] for k in range(4))
    inds_c = rc[:w]
    nep0, nep1 = _i32(rc[w]), _i32(rc[w + 1])
    inds0, inds1 = r0[:w], r1[:w]
    gc00, gc01 = _i32(r0[w]), _i32(r0[w + 1])
    gc10, gc11 = _i32(r1[w]), _i32(r1[w + 1])
    uncle = jnp.where(_i32(rgp[w]) == a, _i32(rgp[w + 1]), _i32(rgp[w]))
    uncle = jnp.where(gp == NULL, NULL, uncle)

    i0 = jnp.any((inds0 & inds_c) != 0, axis=0)
    i1 = jnp.any((inds1 & inds_c) != 0, axis=0)
    take0 = jnp.where(cfg.disable_shared_inds | (i0 & i1), rand_bit, i0)
    d = jnp.where(take0, c0b, c1b)
    e = jnp.where(take0, c1b, c0b)
    t0 = take0[None]
    inds_d = jnp.where(t0, inds0, inds1)
    inds_e = jnp.where(t0, inds1, inds0)

    hyp_a = inds_a & inds_b & inds_c
    hyp_b = inds_b & inds0 & inds1
    new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

    def width(lanes):
        if slices_wb is not None:
            lanes = lanes | slices_wb[:, :, None]
        return _width_bn(lanes, log2d_w32, uniform_log2, dtype,
                         sparse_w=sparse_w, log2_n_projs=log2_n_projs)

    ev = dict(a=a, b=b_ids, c=c, d=d, e=e, c0b=c0b, c1b=c1b,
              inds_b=inds_b, new_inds_b=new_inds_b, l_a=l_a, l_b=l_b,
              ln_b=width(inds_d | inds_c),
              ln_a=width(new_inds_b | inds_e))
    if width_plane:
        ev['new_width_b'] = _width_bn(new_inds_b, log2d_w32,
                                      uniform_log2, dtype,
                                      sparse_w=sparse_w,
                                      log2_n_projs=log2_n_projs)
    nbrs = jnp.concatenate([a, c, d, e, gp, uncle, nep0, nep1,
                            gc00, gc01, gc10, gc11], axis=1)
    return ev, nbrs


def _accept(ev, lt, u, beta, cfg):
    beta = jnp.asarray(beta)
    if beta.ndim:  # [B] per-lane ladder (parallel tempering)
        beta = beta[:, None]
    if cfg.prob_kind == 'mh':
        delta = costs_ops.delta_log2_local(lt[:, None], ev['l_a'],
                                           ev['l_b'], ev['ln_a'],
                                           ev['ln_b'])
        accept = jnp.log2(u) <= -beta * delta
    elif cfg.prob_kind == 'mh_local':
        # Pair-calibrated Metropolis: the move changes exactly the two
        # node costs {A, B}, so the global linear delta equals the pair
        # sum delta; judging the ratio against the PAIR total (not the
        # tree total) anneals every scale of the tree simultaneously.
        # With the reference's totals-ratio rule a move 12+ bits below
        # the running total is accepted freely in either direction at
        # any beta <= 60, and with ~N/2 simultaneous proposals per
        # round that free uphill churn swamps the synchronous engine on
        # deep networks (Sycamore: stalls ~20 bits above the sequential
        # arm).  Original scheduling rule for this engine — the best
        # tree found is what the quality protocol scores.
        m = jnp.maximum(jnp.maximum(ev['l_a'], ev['l_b']),
                        jnp.maximum(ev['ln_a'], ev['ln_b']))
        old = jnp.exp2(ev['l_a'] - m) + jnp.exp2(ev['l_b'] - m)
        new = jnp.exp2(ev['ln_a'] - m) + jnp.exp2(ev['ln_b'] - m)
        delta = (jnp.log2(jnp.maximum(new, _SCALED_FLOOR)) -
                 jnp.log2(jnp.maximum(old, _SCALED_FLOOR)))
        accept = jnp.log2(u) <= -beta * delta
    elif cfg.prob_kind == 'greedy':
        delta = costs_ops.delta_log2_local(lt[:, None], ev['l_a'],
                                           ev['l_b'], ev['ln_a'],
                                           ev['ln_b'])
        accept = delta <= 0.0
    else:
        accept = jnp.ones_like(ev['l_a'], dtype=bool)
    return accept & (ev['a'] != NULL)


def _luby_keep(accept, prio_bits, nbrs, n, nl, interpret):
    """Random-priority independent-set selection over ``[B, NI]``."""
    b_dim, ni = accept.shape
    ids = jnp.arange(nl, n, dtype=jnp.uint32)[None]
    prio = jnp.bitwise_or(prio_bits & jnp.uint32(_PRIO_RAND_MASK),
                          ids).astype(jnp.int32)
    r_acc = jnp.where(accept, prio, jnp.int32(NULL))
    r_full = jnp.concatenate(
        [jnp.full((b_dim, nl), NULL, jnp.int32), r_acc], axis=1)
    rn = gather_gbn(r_full[None], nbrs, interpret=interpret)[0]
    rn = jnp.where(nbrs == NULL, jnp.int32(NULL), rn)
    r_max = jnp.max(rn.reshape(b_dim, 12, ni), axis=1)
    return accept & (r_acc > r_max)


def _apply(S, ev, kept, cfg: SweepConfig, dtype, interpret,
           width_plane=False):
    """Pull-based application of the kept (pairwise-disjoint) moves.

    Every row resolves its own role — B (kept proposer, aligned), A
    (parent of a kept B), C (sibling of a kept B: reparent to B), E
    (moved child: reparent to A) — via three gathers at aligned id
    arrays; there are no scatters.  Role exclusivity follows from the
    pairwise disjointness of the kept ``{A,B,C,D,E}`` sets.
    """
    w = cfg.n_lanes
    nl = cfg.n_leaves
    nk = _nk(dtype)
    b_dim, n = S.shape[1], S.shape[2]
    x_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                             (b_dim, n))
    c0_all = _i32(S[w])
    c1_all = _i32(S[w + 1])
    par_all = _i32(S[w + 2])
    lcc_all = _join_f(S[w + 3:w + 3 + nk], dtype)

    null_pad = jnp.full((b_dim, nl), NULL, jnp.int32)

    def pad_i(vals):
        return jnp.concatenate(
            [null_pad, jnp.where(kept, vals, NULL)], axis=1)

    e_pad = pad_i(ev['e'])
    c_pad = pad_i(ev['c'])
    ln_a_pad = jnp.concatenate(
        [jnp.zeros((b_dim, nl), dtype), ev['ln_a']], axis=1)

    # A-role pull: does one of my children host a kept proposal?
    # (gather_gbn yields 0 for NULL ids, so mask by the id too.)
    pull = jnp.concatenate([_u32(e_pad)[None], _u32(c_pad)[None],
                            _split_f(ln_a_pad)], axis=0)
    idsA = jnp.concatenate([c0_all, c1_all], axis=1)
    gA = gather_gbn(pull, idsA, interpret=interpret)
    e0, e1 = _i32(gA[0, :, :n]), _i32(gA[0, :, n:])
    cv0, cv1 = _i32(gA[1, :, :n]), _i32(gA[1, :, n:])
    ln0 = _join_f(gA[2:2 + nk, :, :n], dtype)
    ln1 = _join_f(gA[2:2 + nk, :, n:], dtype)
    kept0 = (c0_all != NULL) & (e0 != NULL)
    kept1 = (c1_all != NULL) & (e1 != NULL)
    is_a = kept0 | kept1
    e_x = jnp.where(kept0, e0, e1)
    c_x = jnp.where(kept0, cv0, cv1)
    ln_x = jnp.where(kept0, ln0, ln1)

    # C/E-role pulls: sibling (via the parent row) and parent.
    pp = gather_gbn(S[w:w + 3], par_all, interpret=interpret)
    c0p, c1p = _i32(pp[0]), _i32(pp[1])
    gp_x = _i32(pp[2])
    sib = jnp.where(c0p == x_ids, c1p, c0p)
    sib = jnp.where(par_all == NULL, NULL, sib)
    ep_sib = _i32(gather_gbn(_u32(e_pad)[None], sib,
                             interpret=interpret)[0])
    ep_par = _i32(gather_gbn(_u32(e_pad)[None], par_all,
                             interpret=interpret)[0])
    is_c = (sib != NULL) & (ep_sib != NULL)
    is_e = (par_all != NULL) & (ep_par == x_ids)

    # B-role rows (aligned slice of internal nodes).
    new_c0b = jnp.where(ev['c0b'] == ev['e'], ev['c'], ev['c0b'])
    new_c1b = jnp.where(ev['c1b'] == ev['e'], ev['c'], ev['c1b'])

    c0_new = jnp.where(is_a & (c0_all == c_x), e_x, c0_all)
    c0_new = c0_new.at[:, nl:].set(
        jnp.where(kept, new_c0b, c0_new[:, nl:]))
    c1_new = jnp.where(is_a & (c1_all == c_x), e_x, c1_all)
    c1_new = c1_new.at[:, nl:].set(
        jnp.where(kept, new_c1b, c1_new[:, nl:]))
    par_new = jnp.where(is_c, sib, jnp.where(is_e, gp_x, par_all))
    lcc_new = jnp.where(is_a, ln_x, lcc_all)
    lcc_new = lcc_new.at[:, nl:].set(
        jnp.where(kept, ev['ln_b'], lcc_new[:, nl:]))

    S = S.at[:w, :, nl:].set(
        jnp.where(kept[None], ev['new_inds_b'], ev['inds_b']))
    S = S.at[w].set(_u32(c0_new))
    S = S.at[w + 1].set(_u32(c1_new))
    S = S.at[w + 2].set(_u32(par_new))
    S = S.at[w + 3:w + 3 + nk].set(_split_f(lcc_new))
    if width_plane:
        wp_sl = slice(w + 3 + nk, w + 3 + 2 * nk)
        wp = _join_f(S[wp_sl][:, :, nl:], dtype)
        S = S.at[wp_sl, :, nl:].set(
            _split_f(jnp.where(kept, ev['new_width_b'], wp)))
    return S


def _iter_fullsweep(carry, beta, log2d_w32, cfg: SweepConfig,
                    uniform_log2, sparse_w, log2_n_projs, interpret):
    (S, S_min, min_lt, lt, keys, moves, applied) = carry
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    n = S.shape[2]
    ni = n - nl

    keys, u, bits = _draws(keys, ni, dtype)
    ev, nbrs = _propose(S, bits, cfg, log2d_w32, uniform_log2, dtype,
                        sparse_w, log2_n_projs, interpret)
    accept = _accept(ev, lt, u, beta, cfg)
    kept = _luby_keep(accept, bits, nbrs, n, nl, interpret)
    S = _apply(S, ev, kept, cfg, dtype, interpret)

    moves = moves + jnp.int32(ni * S.shape[1])
    applied = applied + jnp.sum(kept.astype(jnp.int32), dtype=jnp.int32)

    lt = _log2_total_bn(_join_f(S[w + 3:w + 3 + nk, :, nl:], dtype))
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    S_min = jax.lax.cond(
        jnp.any(improved),
        lambda args: jnp.where(improved[None, :, None], *args),
        lambda args: args[1], (S, S_min))
    return (S, S_min, min_lt, lt, keys, moves, applied)


@fts.partial(jax.jit,
             static_argnames=('cfg', 'uniform_log2', 'interpret'))
def run_fullsweep(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
                  sparse_wb=None, log2_n_projs=None, *,
                  uniform_log2=None, interpret=None):
    """One synchronous full-tree round per beta.

    Proposals per round = ``N_int * B`` (every internal node; the
    root's proposal is always rejected).  Returns the updated batch and
    ``{'moves', 'applied'}`` metrics, like the other lane-major
    engines.

    ``uniform_log2``: static common log2 dim (see
    :func:`uniform_log2_dim`) enabling the popcount width fast path.
    ``interpret``: forwarded to the Pallas gather (None = auto: the
    Mosaic kernel on TPU, the XLA lowering elsewhere).
    """
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    sparse_w = None if sparse_wb is None else \
        jnp.asarray(sparse_wb).reshape(-1)

    S = _pack(batch.c0, batch.c1, batch.par, batch.inds, batch.lcc)
    S_min = _pack(batch.min_c0, batch.min_c1, batch.min_par,
                  batch.min_inds, batch.lcc)
    lt0 = _log2_total_bn(_join_f(S[w + 3:w + 3 + nk, :, nl:], dtype))

    def step(carry, beta):
        return _iter_fullsweep(carry, beta, log2d_w32, cfg,
                               uniform_log2, sparse_w, log2_n_projs,
                               interpret), None

    carry = (S, S_min, batch.min_log2_total, lt0, batch.keys,
             jnp.int32(0), jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, betas)
    (S, S_min, min_lt, lt, keys, moves, applied) = carry

    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    S_min = jnp.where(improved[None, :, None], S, S_min)
    c0, c1, par, inds, lcc = _unpack(S, w, dtype)
    mc0, mc1, mpar, minds, _ml = _unpack(S_min, w, dtype)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt, mc0, mc1,
                  mpar, minds, keys)
    return out, {'moves': moves, 'applied': applied}


# --------------------------- finite width ---------------------------


def _iter_fullsweep_fw(carry, beta, update_slices, max_width,
                       log2d_w32, skip_w, cfg, uniform_log2, sparse_w,
                       log2_n_projs, interpret):
    """Width-capped synchronous round against the shared slice lanes +
    the periodic greedy reslice-if-better (same cadence semantics as
    the other FW engines)."""
    from tnco_tpu.kernels.sa_finite import _WIDTH_EPS
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _lcc_fw_b)

    (S, slices, S_min, min_slices, min_lt, lt, keys, moves,
     applied) = carry
    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    n = S.shape[2]
    ni = n - nl

    split = jax.vmap(lambda k: tuple(jax.random.split(k, 4)))
    keys, k_u, k_bits, k_reslice = split(keys)
    u = jax.vmap(lambda k: jax.random.uniform(k, (ni,), dtype=dtype))(k_u)
    bits = jax.vmap(lambda k: jax.random.bits(k, (ni,)))(k_bits)

    ev, nbrs = _propose(S, bits, cfg, log2d_w32, uniform_log2, dtype,
                        sparse_w, log2_n_projs, interpret,
                        slices_wb=slices, width_plane=True)
    new_sliced_width = _width_bn(
        ev['new_inds_b'] & ~slices[:, :, None], log2d_w32, uniform_log2,
        dtype, sparse_w=sparse_w, log2_n_projs=log2_n_projs)
    fits = new_sliced_width <= max_width + _WIDTH_EPS
    accept = _accept(ev, lt, u, beta, cfg) & fits
    kept = _luby_keep(accept, bits, nbrs, n, nl, interpret)
    S = _apply(S, ev, kept, cfg, dtype, interpret, width_plane=True)

    moves = moves + jnp.int32(ni * S.shape[1])
    applied = applied + jnp.sum(kept.astype(jnp.int32), dtype=jnp.int32)

    sp_w1 = None if sparse_w is None else sparse_w[:, None]

    def do_reslice(args):
        slices_, S_ = args
        # The greedy slicer + slice-aware lcc rebuild run in the
        # [N, ., B] layout of the batched FW machinery.
        c0, c1, par, inds, lcc, width = _unpack(S_, w, dtype, fw=True)
        new_slices = _greedy_slices_b(
            c0, inds, width, k_reslice, max_width, log2d_w32,
            skip_w[:, None], sp_w1, log2_n_projs,
            uniform_log2=uniform_log2)
        new_lcc = _lcc_fw_b(c0, c1, inds, new_slices, log2d_w32,
                            sp_w1, log2_n_projs,
                            uniform_log2=uniform_log2)
        old_lt = _log2_total_bn(
            _join_f(S_[w + 3:w + 3 + nk, :, nl:], dtype))
        new_lt = _log2_total_bn(new_lcc[nl:].T)
        better = new_lt < old_lt
        slices_out = jnp.where(better[None, :], new_slices, slices_)
        lcc_cur = _join_f(S_[w + 3:w + 3 + nk], dtype)
        lcc_out = jnp.where(better[:, None], new_lcc.T, lcc_cur)
        S_out = S_.at[w + 3:w + 3 + nk].set(_split_f(lcc_out))
        return slices_out, S_out

    has_slices = jnp.any(slices != 0)
    slices, S = jax.lax.cond(update_slices & has_slices, do_reslice,
                             lambda x: x, (slices, S))

    lt = _log2_total_bn(_join_f(S[w + 3:w + 3 + nk, :, nl:], dtype))
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)

    def snap(args):
        S_min, min_slices = args
        return (jnp.where(improved[None, :, None], S, S_min),
                jnp.where(improved[None, :], slices, min_slices))

    S_min, min_slices = jax.lax.cond(
        jnp.any(improved), snap, lambda x: x, (S_min, min_slices))
    return (S, slices, S_min, min_slices, min_lt, lt, keys, moves,
            applied)


@fts.partial(jax.jit,
             static_argnames=('cfg', 'uniform_log2', 'interpret'))
def run_fullsweep_fw(batch, betas, update_slices_mask, max_width,
                     log2d_w32, skip_wb, cfg, sparse_wb=None,
                     log2_n_projs=None, *, uniform_log2=None,
                     interpret=None):
    """Finite-width synchronous full-tree rounds (one per beta)."""
    from tnco_tpu.kernels.sa_finite_batched import SABatchFW

    w = cfg.n_lanes
    nl = cfg.n_leaves
    dtype = log2d_w32.dtype
    nk = _nk(dtype)
    max_width = jnp.asarray(max_width, dtype)
    sparse_w = None if sparse_wb is None else \
        jnp.asarray(sparse_wb).reshape(-1)
    skip_w = jnp.asarray(skip_wb).reshape(-1)

    S = _pack(batch.c0, batch.c1, batch.par, batch.inds, batch.lcc,
              width=batch.width)
    S_min = _pack(batch.min_c0, batch.min_c1, batch.min_par,
                  batch.min_inds, batch.lcc, width=batch.width)
    lt0 = _log2_total_bn(_join_f(S[w + 3:w + 3 + nk, :, nl:], dtype))

    def step(carry, x):
        beta, upd = x
        return _iter_fullsweep_fw(carry, beta, upd, max_width,
                                  log2d_w32, skip_w, cfg, uniform_log2,
                                  sparse_w, log2_n_projs,
                                  interpret), None

    carry = (S, batch.slices, S_min, batch.min_slices,
             batch.min_log2_total, lt0, batch.keys, jnp.int32(0),
             jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, (betas, update_slices_mask))
    (S, slices, S_min, min_slices, min_lt, lt, keys, moves,
     applied) = carry

    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    S_min = jnp.where(improved[None, :, None], S, S_min)
    min_slices = jnp.where(improved[None, :], slices, min_slices)
    c0, c1, par, inds, lcc, width = _unpack(S, w, dtype, fw=True)
    mc0, mc1, mpar, minds, _ml, _mw = _unpack(S_min, w, dtype, fw=True)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatchFW(c0, c1, par, inds, hyper, lcc, width, slices, lt,
                    min_lt, mc0, mc1, mpar, minds, min_slices, keys)
    return out, {'moves': moves, 'applied': applied}
