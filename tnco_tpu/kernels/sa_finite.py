"""Finite-width (memory-constrained) SA kernel with index slicing.

Reproduces the reference finite-width optimizer
(include/tnco/optimize/finite_width/greedy/optimizer.hpp:43-460):

- every tensor must fit ``max_width`` after removing sliced indices;
- a contraction is charged for ``in1 | in2 | slices`` — sliced dims
  multiply every contraction because the whole tree reruns per slice value
  (finite_width/cost_model/simple.hpp:124-145);
- moves that would overflow the width are rejected outright, or (when
  ``max_new_slices > 0``) rescued by adding random slices and re-costing the
  whole tree (greedy/optimizer.hpp:226-321);
- every ``update_slices`` sweeps the slice set is re-derived greedily from
  scratch and kept only if the total cost improves
  (greedy/optimizer.hpp:359-376).

TPU design notes beyond :mod:`tnco_tpu.kernels.sa_infinite`:

- ``slices`` is one extra bitset lane row of the replica state.
- The greedy slicer (reference greedy/utils.hpp:24-125) is vectorized: one
  global argsort of the per-index priority (big-tensor count, then log2 dim,
  then random jitter), then per node a *prefix threshold* over the sorted
  candidate bits — "slice while still too wide" — computed with cumulative
  sums instead of a data-dependent loop.  Nodes are visited in index order
  (the reference uses post-order; any order yields a valid width-respecting
  slice set).
"""

from dataclasses import dataclass
import functools as fts

import jax
import jax.numpy as jnp

from tnco_tpu.kernels.sa_infinite import compute_hyper
from tnco_tpu.ops import bitops
from tnco_tpu.ops import costs as costs_ops

__all__ = ['SweepConfigFW', 'SAStateFW', 'init_state_fw', 'sweep_fw',
           'run_sweeps_fw', 'run_sweeps_fw_batch', 'greedy_slices']

NULL = -1
_WIDTH_EPS = 1e-4  # f32 slack on width comparisons


@dataclass(frozen=True)
class SweepConfigFW:
    n_leaves: int
    n_lanes: int
    disable_shared_inds: bool = False
    prob_kind: str = 'mh'
    max_new_slices: int = 0


@jax.tree_util.register_pytree_node_class
class SAStateFW:
    """Finite-width replica state: IM state + slices and width caches.

    Mirrors greedy/optimizer.hpp:61-70 (width_cache, slices, min_slices).
    """

    __slots__ = ('nodes', 'inds', 'hyper', 'lcc', 'width', 'slices',
                 'log2_total', 'min_log2_total', 'min_nodes', 'min_inds',
                 'min_slices', 'key')

    def __init__(self, nodes, inds, hyper, lcc, width, slices, log2_total,
                 min_log2_total, min_nodes, min_inds, min_slices, key):
        self.nodes = nodes
        self.inds = inds
        self.hyper = hyper
        self.lcc = lcc
        self.width = width
        self.slices = slices
        self.log2_total = log2_total
        self.min_log2_total = min_log2_total
        self.min_nodes = min_nodes
        self.min_inds = min_inds
        self.min_slices = min_slices
        self.key = key

    def tree_flatten(self):
        return ((self.nodes, self.inds, self.hyper, self.lcc, self.width,
                 self.slices, self.log2_total, self.min_log2_total,
                 self.min_nodes, self.min_inds, self.min_slices, self.key),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def _wfn(lanes, log2d, sparse_lanes, log2_n_projs):
    """Sparse-aware width == log2 cost of an index set.

    Reference: finite_width/cost_model/simple.hpp:38-57 (dense) and
    simple_sparse_inds.hpp:38-51 (sparse cap at log2 n_projs).
    """
    return costs_ops.ccost_log2(lanes, log2d, sparse_lanes=sparse_lanes,
                                log2_n_projs=log2_n_projs)


def compute_lcc_fw(nodes, inds, slices, log2d, sparse_lanes=None,
                   log2_n_projs=None):
    """Per-node log2 cost incl. slices: ``width(in1|in2|slices)``."""
    internal = nodes[:, 0] != NULL
    c0 = jnp.where(internal, nodes[:, 0], 0)
    c1 = jnp.where(internal, nodes[:, 1], 0)
    union = inds[c0] | inds[c1] | slices[None, :]
    lcc = _wfn(union, log2d, sparse_lanes, log2_n_projs)
    return jnp.where(internal, lcc, -jnp.inf).astype(log2d.dtype)


def compute_widths(inds, log2d, sparse_lanes=None, log2_n_projs=None):
    """Pre-slicing width per node (WidthCache,
    finite_width/utils.hpp:47-72)."""
    return _wfn(inds, log2d, sparse_lanes, log2_n_projs)


def _pack_bits(bits01, n_lanes):
    """0/1 vector [W*32] -> uint32 lanes [W]."""
    b = bits01.astype(jnp.uint32).reshape(n_lanes, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return (b * weights).sum(axis=1, dtype=jnp.uint32)


def greedy_slices(nodes, inds, width, key, max_width, log2d, skip_lanes,
                  cfg: SweepConfigFW, sparse_lanes=None, log2_n_projs=None,
                  init_slices=None):
    """Greedy slice set so every tensor fits ``max_width``.

    Vectorized port of greedy/utils.hpp:24-125: indices ranked by how many
    over-width tensors contain them (tie-break: larger log2 dim, then
    random), then per node the top-ranked candidate indices are sliced until
    the node fits.

    Returns ``uint32[W]`` slice lanes.
    """
    n_lanes = inds.shape[1]
    n_bits = n_lanes * 32
    dtype = log2d.dtype

    # Per-index count of over-width tensors: bits[N, I] . big[N]
    big = (width > max_width + _WIDTH_EPS).astype(dtype)
    bits = bitops.expand_bits(inds, dtype)  # [N, I]
    n_big = big @ bits  # [I]

    jitter = jax.random.uniform(key, (n_bits,), dtype=dtype)
    score = n_big * 1e6 + log2d + 1e-4 * jitter
    order = jnp.argsort(-score)  # best-first

    log2d_sorted = log2d[order]
    if sparse_lanes is not None:
        sparse_bits = bitops.expand_bits(sparse_lanes, dtype)
        sparse_sorted = sparse_bits[order]
        cap = log2_n_projs
    else:
        sparse_sorted = None
        cap = None

    skip_bits_sorted = bitops.expand_bits(skip_lanes, dtype)[order]

    slices0 = jnp.zeros(n_lanes, dtype=jnp.uint32) if init_slices is None \
        else init_slices

    def body(t, slices):
        xs = inds[t]
        sliced = xs & ~slices
        sw = _wfn(sliced, log2d, sparse_lanes, log2_n_projs)

        cand_sorted = (bitops.expand_bits(sliced, dtype)[order] *
                       (1.0 - skip_bits_sorted))

        if sparse_sorted is None:
            # Width after removing every candidate strictly before
            # position p (exclusive cumulative sum).
            removed = cand_sorted * log2d_sorted
            cum = jnp.cumsum(removed) - removed
            w_before = sw - cum
        else:
            dense_removed = cand_sorted * log2d_sorted * (1 - sparse_sorted)
            sp_removed = cand_sorted * log2d_sorted * sparse_sorted
            cum_dense = jnp.cumsum(dense_removed) - dense_removed
            cum_sp = jnp.cumsum(sp_removed) - sp_removed
            w_dense0 = _wfn(sliced & ~sparse_lanes, log2d, None, None)
            w_sp0 = _wfn(sliced & sparse_lanes, log2d, None, None)
            w_before = (w_dense0 - cum_dense +
                        jnp.minimum(w_sp0 - cum_sp, cap))

        # Slice a candidate iff the node is still too wide just before
        # its removal ("remove until it fits").
        selected_sorted = (cand_sorted > 0) & (w_before >
                                               max_width + _WIDTH_EPS)
        need = sw > max_width + _WIDTH_EPS
        selected_sorted = selected_sorted & need

        selected = jnp.zeros(n_bits, dtype=jnp.bool_).at[order].set(
            selected_sorted)
        return slices | _pack_bits(selected, n_lanes)

    return jax.lax.fori_loop(0, inds.shape[0], body, slices0)


def greedy_slices_host(inds, log2_dims, max_width, rng, *,
                       skip_bits=None, sparse_bits=None,
                       log2_n_projs=None):
    """Host (numpy) greedy slicer — same ranking as :func:`greedy_slices`.

    Used for replica-batch initialization where per-replica device calls
    would dominate (one device round-trip per replica behind a network
    tunnel).  Any width-respecting slice set is a valid initial state;
    jitter comes from ``rng`` instead of a JAX key.

    Args:
        inds: ``uint32[N, W]`` index lanes.
        log2_dims: ``float64[n_inds]`` (unpadded).
        rng: ``random.Random`` (or anything with ``random()``).

    Returns ``uint32[W]`` slice lanes.
    """
    import numpy as np

    n, w = inds.shape
    n_bits = w * 32
    log2d = np.zeros(n_bits)
    log2d[:len(log2_dims)] = np.asarray(log2_dims, dtype=np.float64)
    shifts = np.arange(32, dtype=np.uint32)
    bits = (((inds[:, :, None] >> shifts[None, None, :]) & 1)
            .astype(bool).reshape(n, n_bits))
    if sparse_bits is None:
        width = bits @ log2d
    else:
        sp = np.asarray(sparse_bits, dtype=bool)
        width = ((bits & ~sp) @ log2d +
                 np.minimum((bits & sp) @ log2d, log2_n_projs))
    big = (width > max_width + _WIDTH_EPS).astype(np.float64)
    n_big = big @ bits
    jitter = np.asarray([rng.random() for _ in range(n_bits)])
    order = np.argsort(-(n_big * 1e6 + log2d + 1e-4 * jitter),
                       kind='stable')
    skip = (np.zeros(n_bits, dtype=bool) if skip_bits is None else
            np.asarray(skip_bits, dtype=bool))
    log2d_sorted = log2d[order]
    skip_sorted = skip[order]
    sp = None if sparse_bits is None else \
        np.asarray(sparse_bits, dtype=bool)
    sp_sorted = None if sp is None else sp[order]

    slices = np.zeros(n_bits, dtype=bool)
    for t in range(n):
        cand = bits[t] & ~slices
        if sp is None:
            sw = float(log2d @ cand)
        else:
            sw = float(log2d @ (cand & ~sp) +
                       min(log2d @ (cand & sp), log2_n_projs))
        if sw <= max_width + _WIDTH_EPS:
            continue
        cand_sorted = cand[order] & ~skip_sorted
        removed = cand_sorted * log2d_sorted
        if sp_sorted is None:
            cum = np.cumsum(removed) - removed
            w_before = sw - cum
        else:
            dense_rm = removed * ~sp_sorted
            sp_rm = removed * sp_sorted
            cum_d = np.cumsum(dense_rm) - dense_rm
            cum_s = np.cumsum(sp_rm) - sp_rm
            w_d0 = float(log2d @ (cand & ~sp))
            w_s0 = float(log2d @ (cand & sp))
            w_before = (w_d0 - cum_d +
                        np.minimum(w_s0 - cum_s, log2_n_projs))
        sel = cand_sorted & (w_before > max_width + _WIDTH_EPS)
        slices[order[sel]] = True

    packed = np.packbits(slices.reshape(w, 32)[:, ::-1].astype(np.uint8),
                         axis=1)
    return np.asarray(
        [int.from_bytes(bytes(row), 'big') for row in packed],
        dtype=np.uint32)


def init_state_fw(ctree: 'ctree_mod.ContractionTree', seed, max_width,
                  log2_dims_padded=None, *, skip_lanes=None,
                  sparse_lanes=None, log2_n_projs=None, slices=None,
                  dtype=jnp.float32) -> SAStateFW:
    """Builds the device state; derives initial slices greedily if absent
    (reference ctor, greedy/optimizer.hpp:85-97)."""
    nodes = jnp.asarray(ctree.nodes_array, dtype=jnp.int32)
    inds = jnp.asarray(ctree.inds_array, dtype=jnp.uint32)
    n_lanes = inds.shape[1]
    if log2_dims_padded is None:
        log2_dims_padded = bitops.pad_log2_dims(ctree.log2_dims_array,
                                                n_lanes, dtype)
    if skip_lanes is None:
        skip_lanes = jnp.zeros(n_lanes, dtype=jnp.uint32)

    key = seed if isinstance(seed, jax.Array) else \
        jax.random.PRNGKey(int(seed))
    key, k_slice = jax.random.split(key)

    width = compute_widths(inds, log2_dims_padded, sparse_lanes,
                           log2_n_projs)
    if slices is None:
        cfg = SweepConfigFW(n_leaves=ctree.n_leaves, n_lanes=n_lanes)
        slices = greedy_slices(nodes, inds, width, k_slice,
                               jnp.asarray(max_width, dtype),
                               log2_dims_padded, skip_lanes, cfg,
                               sparse_lanes, log2_n_projs)
    else:
        slices = jnp.asarray(slices, dtype=jnp.uint32)

    hyper = compute_hyper(nodes, inds)
    lcc = compute_lcc_fw(nodes, inds, slices, log2_dims_padded,
                         sparse_lanes, log2_n_projs)
    lt = costs_ops.log2_total_from_lcc(lcc, ctree.n_leaves)
    return SAStateFW(nodes, inds, hyper, lcc, width, slices, lt, lt, nodes,
                     inds, slices, key)


def _accept_fn(cfg):
    if cfg.prob_kind == 'mh':
        return costs_ops.mh_log2_accept
    if cfg.prob_kind == 'greedy':
        return lambda log2_u, beta, l_new, l_old: l_new <= l_old
    if cfg.prob_kind == 'base':
        return lambda log2_u, beta, l_new, l_old: jnp.bool_(True)
    raise ValueError(f"Unknown prob_kind: {cfg.prob_kind!r}")


def _pick_rescue_slices(key, cand_lanes, k, start_width, max_width, log2d,
                        n_lanes):
    """Random candidate bits, added one by one until the width fits.

    Port of the rescue selection (greedy/optimizer.hpp:230-269): random
    order without replacement, at most ``k`` picks, stop once
    ``start_width - sum(log2 dims of picks) <= max_width``.  (Like the
    reference, contributions are plain log2 dims even under the sparse
    model.)  Vectorized as a prefix threshold over a random priority order.
    """
    n_bits = n_lanes * 32
    dtype = log2d.dtype
    cand = bitops.expand_bits(cand_lanes, dtype)
    order = jnp.argsort(-(jax.random.uniform(key, (n_bits,), dtype=dtype) *
                          cand + cand))  # candidates first, random order
    cand_sorted = cand[order]
    removed = cand_sorted * log2d[order]
    w_before = start_width - (jnp.cumsum(removed) - removed)
    rank = jnp.cumsum(cand_sorted) - cand_sorted  # #candidates before p
    selected_sorted = ((cand_sorted > 0) &
                       (w_before > max_width + _WIDTH_EPS) & (rank < k))
    selected = jnp.zeros(n_bits, jnp.bool_).at[order].set(selected_sorted)
    return _pack_bits(selected, n_lanes)


def sweep_fw(state: SAStateFW, beta, update_slices, max_width, log2d,
             skip_lanes, cfg: SweepConfigFW, sparse_lanes=None,
             log2_n_projs=None) -> SAStateFW:
    """One width-capped leaf-to-root sweep + optional reslice.

    ``update_slices`` is a traced bool (the driver passes
    ``sweep_index % update_slices == 0``, finite_width/sa.py:228).
    """
    accept_fn = _accept_fn(cfg)
    n_leaves = cfg.n_leaves
    n_lanes = cfg.n_lanes
    max_width = jnp.asarray(max_width, log2d.dtype)

    key, k_leaf = jax.random.split(state.key)
    leaf = jax.random.randint(k_leaf, (), 0, n_leaves)
    pos_b0 = state.nodes[leaf, 2]
    lt0 = costs_ops.log2_total_from_lcc(state.lcc, n_leaves)

    def wfn(lanes):
        return _wfn(lanes, log2d, sparse_lanes, log2_n_projs)

    def cond(carry):
        nodes = carry[0]
        pos_b = carry[-3]
        return (pos_b != NULL) & (nodes[pos_b, 2] != NULL)

    def body(carry):
        (nodes, inds, hyper, lcc, width, slices, lt, pos_b, key,
         moves) = carry
        key, k_pick, k_u, k_slices, k_u2 = jax.random.split(key, 5)

        b = pos_b
        a = nodes[b, 2]
        c0b, c1b = nodes[b, 0], nodes[b, 1]
        c0a, c1a = nodes[a, 0], nodes[a, 1]
        c = jnp.where(c0a == b, c1a, c0a)

        inds_c = inds[c]
        inds0, inds1 = inds[c0b], inds[c1b]
        i0 = bitops.any_bits(inds0 & inds_c)
        i1 = bitops.any_bits(inds1 & inds_c)
        both = i0 & i1
        rand_bit = jax.random.bernoulli(k_pick)
        take0 = jnp.where(cfg.disable_shared_inds | both, rand_bit, i0)
        d = jnp.where(take0, c0b, c1b)
        e = jnp.where(take0, c1b, c0b)
        inds_d = jnp.where(take0, inds0, inds1)
        inds_e = jnp.where(take0, inds1, inds0)

        inds_a = inds[a]
        hyp_a, hyp_b = hyper[a], hyper[b]
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        new_width_b = wfn(new_inds_b)
        new_sliced_width_b = wfn(new_inds_b & ~slices)
        fits = new_sliced_width_b <= max_width + _WIDTH_EPS

        l_a, l_b = lcc[a], lcc[b]
        ln_b = wfn(inds_d | inds_c | slices)
        ln_a = wfn(new_inds_b | inds_e | slices)
        l_new = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b)

        u = jax.random.uniform(k_u, dtype=lt.dtype)
        accept = fits & accept_fn(jnp.log2(u), beta, l_new, lt)

        new_slices = slices
        new_lcc_full = lcc
        rescued = jnp.bool_(False)
        if cfg.max_new_slices > 0:
            # Rescue branch (greedy/optimizer.hpp:226-321): add up to k
            # random new slices; if the node then fits, re-cost the whole
            # tree under the new slice set and accept on the full delta.
            cand_lanes = new_inds_b & ~slices & ~skip_lanes
            sel_lanes = _pick_rescue_slices(k_slices, cand_lanes,
                                            cfg.max_new_slices,
                                            new_sliced_width_b, max_width,
                                            log2d, n_lanes)
            cand_slices = slices | sel_lanes
            rescued_width = wfn(new_inds_b & ~cand_slices)
            can_rescue = (~fits) & (rescued_width <= max_width + _WIDTH_EPS)

            lcc_try = compute_lcc_fw(
                nodes.at[a, 0].set(jnp.where(c0a == c, e, c0a))
                .at[a, 1].set(jnp.where(c1a == c, e, c1a))
                .at[b, 0].set(jnp.where(c0b == e, c, c0b))
                .at[b, 1].set(jnp.where(c1b == e, c, c1b)),
                inds.at[b].set(new_inds_b), cand_slices, log2d,
                sparse_lanes, log2_n_projs)
            lt_try = costs_ops.log2_total_from_lcc(lcc_try, n_leaves)
            u2 = jax.random.uniform(k_u2, dtype=lt.dtype)
            ok = can_rescue & accept_fn(jnp.log2(u2), beta, lt_try, lt)
            rescued = ok
            new_slices = jnp.where(ok, cand_slices, slices)
            new_lcc_full = jnp.where(ok, lcc_try, lcc)
            l_new = jnp.where(ok, lt_try, l_new)
            accept = accept | ok

        # Apply the swap (masked)
        nodes = nodes.at[a, 0].set(jnp.where(accept & (c0a == c), e, c0a))
        nodes = nodes.at[a, 1].set(jnp.where(accept & (c1a == c), e, c1a))
        nodes = nodes.at[b, 0].set(jnp.where(accept & (c0b == e), c, c0b))
        nodes = nodes.at[b, 1].set(jnp.where(accept & (c1b == e), c, c1b))
        nodes = nodes.at[c, 2].set(jnp.where(accept, b, nodes[c, 2]))
        nodes = nodes.at[e, 2].set(jnp.where(accept, a, nodes[e, 2]))

        inds = inds.at[b].set(jnp.where(accept, new_inds_b, inds[b]))
        hyper = hyper.at[a].set(
            jnp.where(accept, inds_a & new_inds_b & inds_e, hyp_a))
        hyper = hyper.at[b].set(
            jnp.where(accept, new_inds_b & inds_d & inds_c, hyp_b))
        width = width.at[b].set(jnp.where(accept, new_width_b, width[b]))

        if cfg.max_new_slices > 0:
            slices = new_slices
            lcc = jnp.where(rescued, new_lcc_full, lcc)
            lcc = lcc.at[a].set(
                jnp.where(accept & ~rescued, ln_a, lcc[a]))
            lcc = lcc.at[b].set(
                jnp.where(accept & ~rescued, ln_b, lcc[b]))
        else:
            lcc = lcc.at[a].set(jnp.where(accept, ln_a, l_a))
            lcc = lcc.at[b].set(jnp.where(accept, ln_b, l_b))
        lt = jnp.where(accept, l_new, lt)

        return (nodes, inds, hyper, lcc, width, slices, lt, a, key,
                moves + 1)

    carry = (state.nodes, state.inds, state.hyper, state.lcc, state.width,
             state.slices, lt0, pos_b0, key, jnp.int32(0))
    (nodes, inds, hyper, lcc, width, slices, _, _, key,
     moves) = jax.lax.while_loop(cond, body, carry)

    # Post-sweep reslice-if-better (greedy/optimizer.hpp:359-376)
    key, k_reslice = jax.random.split(key)

    def do_reslice(args):
        nodes, inds, width, slices, lcc = args
        new_slices = greedy_slices(nodes, inds, width, k_reslice, max_width,
                                   log2d, skip_lanes, cfg, sparse_lanes,
                                   log2_n_projs)
        new_lcc = compute_lcc_fw(nodes, inds, new_slices, log2d,
                                 sparse_lanes, log2_n_projs)
        better = (costs_ops.log2_total_from_lcc(new_lcc, n_leaves) <
                  costs_ops.log2_total_from_lcc(lcc, n_leaves))
        return (jnp.where(better, new_slices, slices),
                jnp.where(better, new_lcc, lcc))

    def skip_reslice(args):
        *_, slices, lcc = args
        return slices, lcc

    has_slices = bitops.any_bits(slices)
    slices, lcc = jax.lax.cond(update_slices & has_slices, do_reslice,
                               skip_reslice,
                               (nodes, inds, width, slices, lcc))

    lt_final = costs_ops.log2_total_from_lcc(lcc, n_leaves)
    improved = lt_final < state.min_log2_total
    min_log2_total = jnp.where(improved, lt_final, state.min_log2_total)
    min_nodes = jnp.where(improved, nodes, state.min_nodes)
    min_inds = jnp.where(improved, inds, state.min_inds)
    min_slices = jnp.where(improved, slices, state.min_slices)

    new_state = SAStateFW(nodes, inds, hyper, lcc, width, slices, lt_final,
                          min_log2_total, min_nodes, min_inds, min_slices,
                          key)
    return new_state, moves


def _run_sweeps_fw(state: SAStateFW, betas, update_slices_mask, max_width,
                   log2d, skip_lanes, cfg: SweepConfigFW, sparse_lanes=None,
                   log2_n_projs=None):
    """One sweep per beta; ``update_slices_mask[i]`` turns on reslicing."""

    def step(s, x):
        beta, upd = x
        s, moves = sweep_fw(s, beta, upd, max_width, log2d, skip_lanes, cfg,
                            sparse_lanes, log2_n_projs)
        return s, (s.log2_total, s.min_log2_total, moves)

    state, (lt_hist, min_hist, moves_hist) = jax.lax.scan(
        step, state, (betas, update_slices_mask))
    return state, {'log2_total': lt_hist, 'log2_min_total': min_hist,
                   'moves': moves_hist}


run_sweeps_fw = fts.partial(jax.jit, static_argnames=('cfg',))(
    _run_sweeps_fw)


@fts.partial(jax.jit, static_argnames=('cfg',))
def run_sweeps_fw_batch(states: SAStateFW, betas, update_slices_mask,
                        max_width, log2d, skip_lanes, cfg: SweepConfigFW,
                        sparse_lanes=None, log2_n_projs=None):

    def one(s):
        return _run_sweeps_fw(s, betas, update_slices_mask, max_width,
                              log2d, skip_lanes, cfg, sparse_lanes,
                              log2_n_projs)

    return jax.vmap(one)(states)
