"""Vectorized per-replica row scatters (the chained pull-engine's dual
of :mod:`tnco_tpu.kernels.pallas_gather`).

XLA lowers a scatter whose row index varies per lane (``vals[b,
ids[b, q]] = upd[b, q]``) to a scalar loop on TPU — measured ~4-11 ns
per scattered element at Sycamore shapes.  This module replaces it
with two vector passes:

1. :func:`inv_ids` inverts the id list once per iteration: ``inv[b, n]
   = q`` such that ``ids[b, q] == n`` (the LAST matching ``q`` wins;
   callers pass disjoint ids so ties don't arise in the engines).
   One unrolled in-range select per (query, node-block) on the VPU.
2. :func:`scatter_rows_gbn` then rewrites every plane with lane-wise
   ``dynamic_gather`` *from the update buffer*: ``out[g, b, n] =
   upd[g, b, inv[b, n]]`` where ``inv >= 0`` else ``vals[g, b, n]``.
   The inversion is paid once and reused across all ``G`` planes.

Layout contract matches the gather kernel: ``[..., B-sublanes,
N-lanes]``; ids/updates are ``[B, Q]``.  Exact for any 32-bit dtype
(bits move, no arithmetic).  Out-of-range ids (NULL = -1) scatter
nothing.

Reference context: the reference's sequential sweep mutates four tree
rows per accepted proposal in place (include/tnco/optimize/
infinite_memory/optimizer.hpp:169-188); this is the bandwidth-shaped
equivalent for P chained walks per replica applied simultaneously.
"""

import functools as fts

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['inv_ids', 'scatter_rows_gbn', 'scatter_rows_inplace',
           'scatter_supported']

_LANES = 128
_MAX_Q = 2048  # unroll bound for the inversion kernel
_MAX_VMEM_BLOCK = 6 * 1024 * 1024


def _pad_to(x, m):
    return -(-x // m) * m


def scatter_supported(b: int, q: int) -> bool:
    """True when the Mosaic kernels handle this (B, Q) shape."""
    return (q <= _MAX_Q and
            _pad_to(b, 8) * _pad_to(q, _LANES) * 4 <= _MAX_VMEM_BLOCK)


def _inv_kernel(ids_ref, out_ref, *, q_chunk):
    """One (node-block, id-chunk) grid step of the inversion.

    The id axis lives in the GRID (inner dimension), not in an
    unrolled in-kernel loop: the unrolled form's scoped-VMEM
    temporaries grow linearly with Q and blow the 16 MB scoped limit
    at walks-engine P=384 shapes (Q = 2P = 768 ids measured 16.46 MB
    scoped).  Gridding bounds the live range at one ``q_chunk`` unroll
    (~2.7 MB at b_pad=64) for any Q; the out block is revisited across
    consecutive id-chunk steps (same block index), accumulating in
    VMEM, and ascending (qb, j) order preserves the last-q-wins tie
    rule.  Padded ids (-1) never match a lane id, so running over the
    padded id range needs no masking.
    """
    base = pl.program_id(0) * _LANES
    qb = pl.program_id(1)
    b_pad = ids_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b_pad, _LANES), 1) + base

    @pl.when(qb == 0)
    def _():
        out_ref[...] = jnp.full((b_pad, _LANES), -1, jnp.int32)

    acc = out_ref[...]
    off = qb * q_chunk
    for j in range(q_chunk):
        idc = ids_ref[:, j:j + 1]  # [b_pad, 1]
        acc = jnp.where(idc == lane, off + j, acc)
    out_ref[...] = acc


def _inv_xla(ids_bq, n):
    b, q = ids_bq.shape
    ok = (ids_bq >= 0) & (ids_bq < n)
    safe = jnp.where(ok, ids_bq, n)
    qi = jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[None], (b, q))
    inv = jnp.full((b, n + 1), -1, jnp.int32)
    # Unique ids by contract; `set` order on duplicates is undefined in
    # XLA, matching the documented "callers pass disjoint ids".
    inv = inv.at[jnp.arange(b)[:, None], safe].set(qi)
    return inv[:, :n]


@fts.partial(jax.jit, static_argnames=('n', 'interpret'))
def inv_ids(ids_bq, n: int, *, interpret=None):
    """``[B, Q]`` ids -> ``[B, n]`` inverse map (-1 where no id).

    ``inv[b, ids[b, q]] = q`` for in-range ids; the last ``q`` wins on
    (contract-violating) duplicates under the Mosaic kernel.
    """
    b, q = ids_bq.shape
    if interpret is None:
        if (jax.devices()[0].platform != 'tpu'
                or not scatter_supported(b, q)):
            return _inv_xla(ids_bq, n)
        interpret = False

    b_pad = _pad_to(b, 8)
    q_pad = _pad_to(q, _LANES)
    n_pad = _pad_to(n, _LANES)
    ids_p = jnp.pad(ids_bq, ((0, b_pad - b), (0, q_pad - q)),
                    constant_values=-1)
    out = pl.pallas_call(
        fts.partial(_inv_kernel, q_chunk=_LANES),
        grid=(n_pad // _LANES, q_pad // _LANES),
        in_specs=[
            pl.BlockSpec((b_pad, _LANES), lambda nb, qb: (0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, _LANES), lambda nb, qb: (0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(ids_p)
    return out[:b, :n]


def _scatter_kernel(inv_ref, upd_ref, vals_ref, out_ref, *, q_pad):
    invb = inv_ref[...]  # [b_pad, LANES]
    u = upd_ref[0]       # [b_pad, q_pad]
    acc = vals_ref[0]    # [b_pad, LANES]
    for j in range(q_pad // _LANES):
        blk = u[:, j * _LANES:(j + 1) * _LANES]
        loc = jnp.clip(invb - j * _LANES, 0, _LANES - 1)
        g = jnp.take_along_axis(blk, loc, axis=1)
        hit = (invb >= j * _LANES) & (invb < (j + 1) * _LANES)
        acc = jnp.where(hit, g, acc)
    out_ref[0] = acc


def _scatter_kernel_wide(inv_ref, upd_ref, vals_ref, out_ref, *, q_pad,
                         n_pad):
    """Whole-plane variant: grid over planes only, node blocks looped
    in-kernel.  Many-plane callers (the walks engines' merged apply)
    pay ~(planes) large DMAs instead of ~(planes x N/128) 32 KB ones —
    the per-grid-step DMA setup dominated the tiled kernel at Sycamore
    shapes (67 planes x 26 blocks ~ 1.7 k steps ~ 1 ms/call)."""
    u = upd_ref[0]       # [b_pad, q_pad]
    for nb in range(n_pad // _LANES):
        sl = slice(nb * _LANES, (nb + 1) * _LANES)
        invb = inv_ref[:, sl]
        acc = vals_ref[0, :, sl]
        for j in range(q_pad // _LANES):
            blk = u[:, j * _LANES:(j + 1) * _LANES]
            loc = jnp.clip(invb - j * _LANES, 0, _LANES - 1)
            g = jnp.take_along_axis(blk, loc, axis=1)
            hit = (invb >= j * _LANES) & (invb < (j + 1) * _LANES)
            acc = jnp.where(hit, g, acc)
        out_ref[0, :, sl] = acc


def _scatter_xla(vals_gbn, inv_bn, upd_gbq):
    q = upd_gbq.shape[-1]
    safe = jnp.clip(inv_bn, 0, q - 1)
    g = jnp.take_along_axis(upd_gbq, safe[None, :, :], axis=2)
    return jnp.where((inv_bn >= 0)[None, :, :], g, vals_gbn)


@fts.partial(jax.jit, static_argnames=('interpret', 'planes'))
def scatter_rows_gbn(vals_gbn, ids_bq, upd_gbq, *, interpret=None,
                     planes=None):
    """Row scatter: ``out[g, b, ids[b, q]] = upd[g, b, q]``.

    Out-of-range ids (NULL) leave ``vals`` untouched; in-range ids must
    be unique per replica row (the engines' kept proposals are pairwise
    disjoint by construction).  Exact for any 32-bit dtype.

    ``planes=(lo, hi)`` scatters into only that plane range of ``vals``
    (``upd`` is ``[hi-lo, B, Q]``; the output is ``[hi-lo, B, N]``)
    without slicing ``vals`` on the caller side — the kernel reads the
    untouched planes never, so no copy of them is materialized.  The
    caller writes the result back with ``vals.at[lo:hi].set(out)``.
    """
    if planes is not None:
        lo, hi = planes
    else:
        lo, hi = 0, vals_gbn.shape[0]
    g, b, n = hi - lo, vals_gbn.shape[1], vals_gbn.shape[2]
    _, q = ids_bq.shape
    use_xla = None
    if interpret is None:
        if (jax.devices()[0].platform != 'tpu'
                or not scatter_supported(b, q)):
            use_xla = True
        else:
            interpret = False
    if use_xla:
        inv = inv_ids(ids_bq, n, interpret=None)
        return _scatter_xla(vals_gbn[lo:hi], inv, upd_gbq)

    inv = inv_ids(ids_bq, n, interpret=interpret)

    dtype = vals_gbn.dtype
    vals_i = jax.lax.bitcast_convert_type(vals_gbn, jnp.int32) \
        if dtype != jnp.int32 else vals_gbn
    upd_i = jax.lax.bitcast_convert_type(upd_gbq, jnp.int32) \
        if dtype != jnp.int32 else upd_gbq
    b_pad = _pad_to(b, 8)
    n_pad = _pad_to(n, _LANES)
    q_pad = _pad_to(q, _LANES)
    # No-op when the caller keeps its state pre-padded (hot path).
    vals_p = jnp.pad(vals_i, ((0, 0), (0, b_pad - b), (0, n_pad - n)))
    upd_p = jnp.pad(upd_i, ((0, 0), (0, b_pad - b), (0, q_pad - q)))
    inv_p = jnp.pad(inv, ((0, b_pad - b), (0, n_pad - n)),
                    constant_values=-1)

    aliases = {2: 0} if planes is None and b_pad == b and n_pad == n \
        else {}
    # Whole-plane blocks whenever VMEM allows (~2 in + 2 out double-
    # buffered plane blocks + the shared inv block); otherwise the
    # 128-lane tiled kernel.
    if b_pad * n_pad * 4 * 5 <= 16 * 1024 * 1024:
        out = pl.pallas_call(
            fts.partial(_scatter_kernel_wide, q_pad=q_pad, n_pad=n_pad),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((b_pad, n_pad), lambda gi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_pad, q_pad), lambda gi: (gi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_pad, n_pad), lambda gi: (gi + lo, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b_pad, n_pad), lambda gi: (gi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, b_pad, n_pad), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            input_output_aliases=aliases,
            interpret=interpret,
        )(inv_p, upd_p, vals_p)
    else:
        out = pl.pallas_call(
            fts.partial(_scatter_kernel, q_pad=q_pad),
            grid=(g, n_pad // _LANES),
            in_specs=[
                pl.BlockSpec((b_pad, _LANES), lambda gi, nb: (0, nb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_pad, q_pad), lambda gi, nb: (gi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_pad, _LANES),
                             lambda gi, nb: (gi + lo, 0, nb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b_pad, _LANES),
                                   lambda gi, nb: (gi, 0, nb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, b_pad, n_pad), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary', 'arbitrary')),
            input_output_aliases=aliases,
            interpret=interpret,
        )(inv_p, upd_p, vals_p)
    out = out[:, :b, :n]
    if dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, dtype)
    return out


def _inplace_kernel(inv_ref, upd_ref, vals_ref, out_ref, *, q_pad,
                    n_pad, gb):
    """Multi-plane whole-plane scatter (see ``_scatter_kernel_wide``);
    ``gb`` planes per grid step amortize the revolving-buffer waits.
    The node loop is OUTER so the inversion-derived ``loc``/``hit``
    (plane-invariant) are computed once per node block, not per
    plane."""
    u = upd_ref[...]     # [gb, b_pad, q_pad]
    for nb in range(n_pad // _LANES):
        sl = slice(nb * _LANES, (nb + 1) * _LANES)
        invb = inv_ref[:, sl]
        locs, hits = [], []
        for j in range(q_pad // _LANES):
            locs.append(jnp.clip(invb - j * _LANES, 0, _LANES - 1))
            hits.append((invb >= j * _LANES) & (invb < (j + 1) * _LANES))
        for gi in range(gb):
            acc = vals_ref[gi, :, sl]
            for j in range(q_pad // _LANES):
                blk = u[gi, :, j * _LANES:(j + 1) * _LANES]
                g = jnp.take_along_axis(blk, locs[j], axis=1)
                acc = jnp.where(hits[j], g, acc)
            out_ref[gi, :, sl] = acc


@fts.partial(jax.jit, static_argnames=('interpret', 'planes'))
def scatter_rows_inplace(vals_gbn, ids_bq, upd_gbq, *, interpret=None,
                         planes=None):
    """Row scatter into a plane range, returning the FULL state.

    ``out = vals`` with ``out[lo + g, b, ids[b, q]] = upd[g, b, q]``
    for the ``planes=(lo, hi)`` range (default: all planes).  Same id
    contract as :func:`scatter_rows_gbn`.

    On TPU the whole ``vals`` buffer is DONATED to the kernel
    (``input_output_aliases``): planes outside the range are never
    touched (the grid does not visit them, and the aliased buffer
    retains their contents), so the caller pays zero copies — unlike
    composing ``scatter_rows_gbn`` with ``vals.at[lo:hi].set(...)``.
    Measured at the walks-FW apply shapes (132 planes of ``[64, 3328]``
    i32, Q=256): 0.95 -> 0.64 ms with the alias + 4-plane grid blocks.

    Requires ``vals`` pre-padded (``B`` a multiple of 8, ``N`` a
    multiple of 128) on the TPU path — the engines' packed states are.
    """
    if planes is None:
        planes = (0, vals_gbn.shape[0])
    lo, hi = planes
    g, b, n = hi - lo, vals_gbn.shape[1], vals_gbn.shape[2]
    _, q = ids_bq.shape
    padded = b % 8 == 0 and n % _LANES == 0
    if interpret is None:
        if (jax.devices()[0].platform != 'tpu'
                or not scatter_supported(b, q) or not padded):
            inv = inv_ids(ids_bq, n, interpret=None)
            return vals_gbn.at[lo:hi].set(
                _scatter_xla(vals_gbn[lo:hi], inv, upd_gbq))
        interpret = False

    inv = inv_ids(ids_bq, n, interpret=interpret)
    # The kernel only moves 32-bit words (gather + select), so it runs
    # in the caller's dtype directly: a bitcast of the full state here
    # would break XLA's buffer donation and cost a ~0.4 ms copy per
    # call at Sycamore shapes.
    dtype = vals_gbn.dtype
    assert dtype.itemsize == 4 and upd_gbq.dtype == dtype, \
        (dtype, upd_gbq.dtype)
    q_pad = _pad_to(q, _LANES)
    upd_p = jnp.pad(upd_gbq, ((0, 0), (0, 0), (0, q_pad - q)))

    # Largest plane block with lo/g alignment under a ~14 MB VMEM
    # budget (2 in + 2 out double-buffered blocks + inv + upd).
    gb = 1
    for cand in (4, 2):
        if (g % cand == 0 and lo % cand == 0
                and (2 * cand + 2) * b * n * 4 + b * (n + q_pad) * 4
                <= 14 * 1024 * 1024):
            gb = cand
            break

    out = pl.pallas_call(
        fts.partial(_inplace_kernel, q_pad=q_pad, n_pad=n, gb=gb),
        grid=(g // gb,),
        in_specs=[
            pl.BlockSpec((b, n), lambda gi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, b, q_pad), lambda gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, b, n), lambda gi, _lo=lo // gb: (gi + _lo,
                                                               0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, b, n),
                               lambda gi, _lo=lo // gb: (gi + _lo, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(vals_gbn.shape, dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(inv, upd_p, vals_gbn)
    return out
