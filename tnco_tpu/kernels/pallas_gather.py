"""Vectorized per-replica row gathers (the fullsweep engine's primitive).

XLA lowers a gather whose row index varies per lane (``out[q, b] =
vals[ids[q, b], b]``) to a SCALAR loop on TPU — measured ~11 ns per
gathered (row, lane) instance at Sycamore shapes, which made irregular
reads ~80% of the synchronous-sweep iteration.  This kernel does the
same gather on the VPU with Mosaic's lane-wise ``dynamic_gather``
(`jnp.take_along_axis` along lanes, the idiom proven in
``pallas_walker``): data sits as ``[B, N]`` with nodes on LANES, and
each 128-query tile is resolved against each 128-node block with an
in-range select — ``(Q/128)·(N/128)`` vector ops per replica-sublane
group instead of ``Q`` scalar loop trips per replica.  ~50-200x over
the XLA lowering for thin (single-plane) gathers.

Layout contract: callers keep everything in the ``[..., B-sublanes,
N-lanes]`` orientation (the fullsweep engine's internal layout), so no
transposes are needed around the call.

Semantics: ``out[g, b, q] = vals[g, b, ids[b, q]]`` for ``0 <= id <
n``; out-of-range ids (NULL = -1 in particular) yield 0.  Exact for
any 32-bit dtype (moves bits, never arithmetic).

Reference context: the reference's single-threaded sweep does O(1)
pointer chasing per proposal (include/tnco/optimize/infinite_memory/
optimizer.hpp:117-192); this is its bandwidth-shaped equivalent for
~N/2 simultaneous proposals per replica.
"""

import functools as fts

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['gather_gbn', 'gather_bn', 'gather_supported']

_LANES = 128
_MAX_VMEM_BLOCK = 6 * 1024 * 1024  # vals block bytes (double-buffered)


def _pad_to(x, m):
    return -(-x // m) * m


def gather_supported(b: int, n: int) -> bool:
    """True when the [B, N] vals block fits the kernel's VMEM budget."""
    return _pad_to(b, 8) * _pad_to(n, _LANES) * 4 <= _MAX_VMEM_BLOCK


def _kernel(ids_ref, vals_ref, out_ref, *, blq, n_pad):
    v = vals_ref[0]
    for qc in range(blq // _LANES):
        idc = ids_ref[:, qc * _LANES:(qc + 1) * _LANES]
        acc = jnp.zeros(idc.shape, jnp.int32)
        for k in range(n_pad // _LANES):
            blk = v[:, k * _LANES:(k + 1) * _LANES]
            loc = jnp.clip(idc - k * _LANES, 0, _LANES - 1)
            g = jnp.take_along_axis(blk, loc, axis=1)
            hit = (idc >= k * _LANES) & (idc < (k + 1) * _LANES)
            acc = jnp.where(hit, g, acc)
        out_ref[0, :, qc * _LANES:(qc + 1) * _LANES] = acc


def _gather_xla(vals_gbn, ids_bq):
    """Reference XLA lowering (used off-TPU and by the equality tests)."""
    n = vals_gbn.shape[-1]
    safe = jnp.clip(ids_bq, 0, n - 1)
    out = jnp.take_along_axis(vals_gbn, safe[None, :, :], axis=2)
    ok = (ids_bq >= 0) & (ids_bq < n)
    zero = jnp.zeros((), vals_gbn.dtype)
    return jnp.where(ok[None, :, :], out, zero)


@fts.partial(jax.jit, static_argnames=('interpret', 'planes'))
def gather_gbn(vals_gbn, ids_bq, *, interpret=None, planes=None):
    """``[G, B, N]`` planes x ``[B, Q]`` ids -> ``[G, B, Q]``.

    ``interpret=None`` selects the Pallas kernel on TPU and the XLA
    lowering elsewhere (identical values either way).

    ``planes=(lo, hi)`` gathers only that plane range (output
    ``[hi-lo, B, Q]``) WITHOUT slicing ``vals`` on the caller side —
    the kernel grid simply starts at plane ``lo``, so no copy of the
    untouched planes is ever materialized.
    """
    if planes is not None:
        lo, hi = planes
    else:
        lo, hi = 0, vals_gbn.shape[0]
    g, b, n = hi - lo, vals_gbn.shape[1], vals_gbn.shape[2]
    _, q = ids_bq.shape
    if interpret is None:
        if jax.devices()[0].platform != 'tpu' or not gather_supported(b, n):
            return _gather_xla(vals_gbn[lo:hi], ids_bq)
        interpret = False
    dtype = vals_gbn.dtype
    # bitcast-convert is a free XLA bitcast, not a copy
    vals_i = jax.lax.bitcast_convert_type(vals_gbn, jnp.int32) \
        if dtype != jnp.int32 else vals_gbn
    b_pad = _pad_to(b, 8)
    n_pad = _pad_to(n, _LANES)
    blq = min(1024, _pad_to(q, _LANES))
    q_pad = _pad_to(q, blq)
    # NOTE: a nonzero pad here copies the FULL vals array per call —
    # hot callers keep their state pre-padded so this is a no-op.
    vals_p = jnp.pad(vals_i, ((0, 0), (0, b_pad - b), (0, n_pad - n)))
    # padded ids -> -1 (out of range -> 0 output)
    ids_p = jnp.pad(ids_bq, ((0, b_pad - b), (0, q_pad - q)),
                    constant_values=-1)

    out = pl.pallas_call(
        fts.partial(_kernel, blq=blq, n_pad=n_pad),
        grid=(g, q_pad // blq),
        in_specs=[
            pl.BlockSpec((b_pad, blq), lambda gi, qi: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, n_pad), lambda gi, qi: (gi + lo, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_pad, blq), lambda gi, qi: (gi, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, b_pad, q_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(ids_p, vals_p)
    out = out[:, :b, :q]
    if dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, dtype)
    return out


def gather_bn(vals_bn, ids_bq, *, interpret=None):
    """``[B, N]`` x ``[B, Q]`` -> ``[B, Q]`` (single-plane wrapper)."""
    return gather_gbn(vals_bn[None], ids_bq, interpret=interpret)[0]
