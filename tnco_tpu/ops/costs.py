"""Log2-domain cost models and stable total-cost arithmetic.

The reference computes linear-domain costs with up to 1024-bit floats
(include/tnco/fixed_float.hpp) because a contraction cost is a product of
dimensions that can exceed 2^16384.  On TPU we keep every cost in the *log2
domain*: a contraction's log2-cost is just the width of the union of its
input index sets, and sums/differences of linear costs are evaluated with a
scaled (max-shifted) exponential sum.  Exactness, where required, is restored
on the host with Python bigints (see ``ContractionTree.total_cost_exact``).
"""

import jax.numpy as jnp

from tnco_tpu.ops import bitops

__all__ = [
    'ccost_log2', 'log2_total_from_lcc', 'log2_total_from_lcc_last',
    'new_total_log2', 'delta_log2_local', 'mh_log2_accept'
]

# Floor for the scaled linear sum: if the true new total underflows this, the
# move is a colossal improvement and will be accepted regardless.
_SCALED_FLOOR = 2.0**-60


def ccost_log2(union_lanes, log2_dims_padded, *, sparse_lanes=None,
               log2_n_projs=None):
    """log2 of the simple contraction cost for ``in1 | in2`` lanes.

    - Dense: ``prod dims over (in1|in2)``
      (infinite_memory/cost_model/simple.hpp:65-83).
    - Sparse: ``prod(non-sparse) * min(prod(sparse), n_projs)``
      (infinite_memory/cost_model/simple_sparse_inds.hpp:37-49).
    """
    if sparse_lanes is None:
        return bitops.width(union_lanes, log2_dims_padded)
    dense = bitops.width(union_lanes & ~sparse_lanes, log2_dims_padded)
    sparse = bitops.width(union_lanes & sparse_lanes, log2_dims_padded)
    return dense + jnp.minimum(sparse, log2_n_projs)


def pairwise_sum(x):
    """Sum over axis 0 with a PINNED pairwise-halving order.

    ``jnp.sum`` lets XLA pick the reduction order per lowering, so a
    vmapped ``[N]`` reduce and a lane-major ``[N, B]`` reduce of the same
    values can differ by an ulp — enough to flip a knife-edge Metropolis
    accept between engines that must stay bit-identical.  An explicit
    halving tree (pad with exact zeros to a power of two, then repeatedly
    add the two halves) fixes the operation tree per element, and XLA does
    not reassociate distinct HLO adds, so every engine layout — ``[N]``,
    ``[N, B]``, ``[N, P, B]`` — produces identical per-element results.
    """
    n = x.shape[0]
    if n == 0:
        return jnp.zeros(x.shape[1:], x.dtype)
    p = 1 << (n - 1).bit_length() if n > 1 else 1
    if p != n:
        x = jnp.concatenate(
            [x, jnp.zeros((p - n,) + x.shape[1:], x.dtype)], axis=0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = x[:h] + x[h:]
    return x[0]


def log2_total_from_lcc(lcc, n_leaves: int):
    """Stable ``log2(sum_i 2^lcc[i])`` over internal nodes.

    ``lcc`` is laid out leaves-first, so internal nodes are the static slice
    ``lcc[n_leaves:]`` (leaves never change role under tree moves).  The
    leading axis is the node axis; any trailing axes (replica batch, walk)
    are reduced element-wise with an order-pinned pairwise sum so every
    engine layout computes bit-identical totals (see ``pairwise_sum``).
    """
    internal = lcc[n_leaves:]
    if internal.shape[0] == 0:
        # Single-tensor tree: total cost 0 (log2 = -inf); use a large
        # negative sentinel that exp2s to exactly 0 in f32.
        return jnp.full(internal.shape[1:], -jnp.inf, dtype=lcc.dtype)
    m = jnp.max(internal, axis=0)
    s = pairwise_sum(jnp.exp2(internal - m[None]))
    return m + jnp.log2(s)


def log2_total_from_lcc_last(lcc, n_leaves: int):
    """:func:`log2_total_from_lcc` with the node axis LAST.

    Value-identical to ``log2_total_from_lcc(lcc.T, n_leaves)``: the
    internal-node slice, max shift and zero padding select the same
    elements, and :func:`bitops.pairwise_sum_last` pairs index ``i``
    with ``i + h`` exactly as :func:`pairwise_sum` does after the
    transpose — the same per-element f32 operation tree, so the pinned
    cross-engine totals are preserved without materializing an
    ``[N, B]`` transpose (which costs ~0.3 ms/iteration at Sycamore
    shapes in the walks engines' hot loop).
    """
    internal = lcc[..., n_leaves:]
    if internal.shape[-1] == 0:
        return jnp.full(internal.shape[:-1], -jnp.inf, dtype=lcc.dtype)
    m = jnp.max(internal, axis=-1)
    s = bitops.pairwise_sum_last(jnp.exp2(internal - m[..., None]))
    return m + jnp.log2(s)


def new_total_log2(lt, l_a, l_b, ln_a, ln_b):
    """log2 of ``total - ccost_A - ccost_B + new_ccost_A + new_ccost_B``.

    Max-shifted linear evaluation; ``total >= ccost_A + ccost_B`` always
    holds (costs are non-negative), so the result is mathematically positive.
    Catastrophic cancellation can only occur when the move removes nearly all
    of the cost — in which case the (clamped) result is small and the move is
    accepted anyway.
    """
    m = jnp.maximum(lt, jnp.maximum(ln_a, ln_b))
    s = (jnp.exp2(lt - m) - jnp.exp2(l_a - m) - jnp.exp2(l_b - m) +
         jnp.exp2(ln_a - m) + jnp.exp2(ln_b - m))
    return m + jnp.log2(jnp.maximum(s, _SCALED_FLOOR))


def delta_log2_local(lt, l_a, l_b, ln_a, ln_b):
    """``log2(new_total) - log2(total)`` at full *relative* precision.

    ``new_total_log2(...) - lt`` cancels catastrophically once the
    move's terms sit far below the total: with f32 near ``lt ~ 84``
    any relative change below ``~2^-17`` rounds to zero (and to noise
    just above it), so deltas lose their sign long before they lose
    their meaning.  Evaluating the delta *locally* —

        delta = log2(1 + (2^ln_a + 2^ln_b - 2^l_a - 2^l_b) / 2^lt)

    via ``log1p`` keeps the sign and leading digits of the delta exact
    down to relative changes of ``~2^-126`` (f32 normal range), i.e.
    ~109 bits deeper than the subtraction form.  Mathematically equal
    to ``new_total_log2(lt, ...) - lt``; same clamp at the "move
    removes nearly everything" edge.
    """
    m = jnp.maximum(jnp.maximum(l_a, l_b), jnp.maximum(ln_a, ln_b))
    d = (jnp.exp2(ln_a - m) + jnp.exp2(ln_b - m) -
         jnp.exp2(l_a - m) - jnp.exp2(l_b - m))
    x = d * jnp.exp2(m - lt)
    # total' = total + d*2^m >= 0 always; clamp the scaled floor like
    # new_total_log2 so the log argument stays positive.
    x = jnp.maximum(x, jnp.asarray(_SCALED_FLOOR, x.dtype) - 1.0)
    return jnp.log1p(x) * jnp.asarray(1.4426950408889634, x.dtype)


def mh_log2_accept(log2_u, beta, l_new, l_old):
    """Metropolis-Hastings acceptance in the log2 domain.

    The reference acceptance is ``(1 + delta/old)^(-beta)`` for ``delta > 0``
    (optimize/prob/mh.hpp:45-59), which equals ``(new_total/old_total)^-beta``
    because ``delta = new_total - old_total``.  Hence a single comparison:
    ``log2(u) <= -beta * (log2_new - log2_old)``, which also covers
    ``delta <= 0`` (probability 1) for any ``beta >= 0``.
    """
    return log2_u <= -beta * (l_new - l_old)
