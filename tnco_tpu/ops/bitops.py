"""JAX bitset-lane primitives.

Index sets are ``uint32[..., W]`` lane arrays (bit ``j`` of word ``i`` =
index ``32*i + j``), the TPU-native replacement for the reference's
``boost::dynamic_bitset`` (include/tnco/bitset.hpp).  Set algebra is
elementwise integer VPU work; widths (sum of log2 dims over set bits) are
computed by expanding lanes to a 0/1 vector and dotting with a padded
``log2_dims`` table, which XLA fuses into a handful of vector ops.
"""

import jax.numpy as jnp
import numpy as np

__all__ = [
    'expand_bits', 'width', 'any_bits', 'popcount', 'pad_log2_dims',
    'device_dtype', 'LANE_BITS'
]

LANE_BITS = 32


def device_dtype(cost_type: str = 'float64'):
    """Device dtype for a reference ``cost_type`` tag.

    The reference instantiates its C++ kernels per cost type
    (include/tnco/globals.hpp:81-117: float32/float64/float128/float1024).
    Here costs live in the log2 domain, so float32 already covers the
    float1024 *range*; wider tags buy log2-domain precision instead:
    they run the device kernels in float64 when JAX x64 mode is enabled
    (``jax.config.update('jax_enable_x64', True)`` or the
    ``jax.enable_x64(True)`` context), and fall back to float32 —
    with exact host-side bigint audits — otherwise.
    """
    import jax

    if str(cost_type) == 'float32':
        return jnp.float32
    if jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32


def pad_log2_dims(log2_dims: np.ndarray, n_lanes: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Pads a ``log2_dims[n_inds]`` table to ``[n_lanes * 32]`` with zeros."""
    log2_dims = np.asarray(log2_dims, dtype=np.float64)
    out = np.zeros(n_lanes * LANE_BITS, dtype=np.float64)
    out[:log2_dims.shape[0]] = log2_dims
    return jnp.asarray(out, dtype=dtype)


def expand_bits(lanes: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """``uint32[..., W]`` -> ``dtype[..., W*32]`` 0/1 expansion."""
    shifts = jnp.arange(LANE_BITS, dtype=jnp.uint32)
    bits = (lanes[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*lanes.shape[:-1],
                        lanes.shape[-1] * LANE_BITS).astype(dtype)


def pairwise_sum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the LAST axis with a pinned pairwise-halving order.

    A plain dot/``jnp.sum`` lets XLA pick the reduction order per lowering,
    so the vmapped oracle and the lane-major engines can disagree by an ulp
    on the same width — enough to flip a knife-edge Metropolis accept and
    break the cross-engine bit-identity invariant.  The explicit halving
    tree (pad with exact zeros to a power of two, add the two halves until
    one element remains) pins the per-element operation tree; XLA does not
    reassociate distinct HLO adds.  ``sa_batched._width_b`` uses the same
    pairing over its leading bit axis, so all engines agree bit-for-bit.
    """
    n = x.shape[-1]
    if n == 0:
        return jnp.zeros(x.shape[:-1], x.dtype)
    p = 1 << (n - 1).bit_length() if n > 1 else 1
    if p != n:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (p - n,), x.dtype)], axis=-1)
    while x.shape[-1] > 1:
        h = x.shape[-1] // 2
        x = x[..., :h] + x[..., h:]
    return x[..., 0]


def width(lanes: jnp.ndarray, log2_dims_padded: jnp.ndarray) -> jnp.ndarray:
    """Sum of log2 dims over set bits: ``f32[...]``.

    Equals ``log2(prod dims over the index set)`` — both the tensor *width*
    (finite_width/cost_model/simple.hpp:38-57) and the log2 of the simple
    contraction cost (infinite_memory/cost_model/simple.hpp:37-55).
    Order-pinned (see ``pairwise_sum_last``).
    """
    return pairwise_sum_last(
        expand_bits(lanes, log2_dims_padded.dtype) * log2_dims_padded)


def any_bits(lanes: jnp.ndarray) -> jnp.ndarray:
    """True if any bit is set (reduction over the lane axis)."""
    acc = lanes
    for _ in range(lanes.ndim and 1):
        acc = jnp.bitwise_or.reduce(lanes, axis=-1)
    return acc != 0


def popcount(lanes: jnp.ndarray) -> jnp.ndarray:
    """Number of set bits, ``int32[...]``."""
    cnt = jnp.bitwise_count(lanes).astype(jnp.int32)
    return cnt.sum(axis=-1)
