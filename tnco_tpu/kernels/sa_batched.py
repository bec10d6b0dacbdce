"""Lane-major batched SA kernel: masked dense ops instead of gather/scatter.

The vmapped kernel (:mod:`tnco_tpu.kernels.sa_infinite`) lowers per-replica
row gathers/scatters to batched gather/scatter HLOs, which are slow on TPU.
This engine keeps identical semantics (bit-identical PRNG streams per
replica) but stores every state array **replica-minor** — ``[N, B]`` /
``[N, W, B]`` with the replica axis on the 128-wide lanes — and replaces

- ``x[pos]``        with a one-hot row mask + masked reduction over ``N``;
- ``x.at[pos].set`` with a masked ``where`` over ``N``;

so every step of the leaf-to-root walk is pure VPU element-wise work + small
reductions that XLA fuses.  Cost per move is O(N·W) instead of O(W), but
fully vectorized over hundreds of lanes — a large net win on TPU.
"""

import functools as fts

import jax
import jax.numpy as jnp
import numpy as np

from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import costs as costs_ops

__all__ = ['SABatch', 'from_states', 'replica_state', 'run_sweeps_batched']

NULL = -1


@jax.tree_util.register_pytree_node_class
class SABatch:
    """Replica-minor batched SA state (infinite memory).

    Arrays: ``c0,c1,par,lcc:[N,B]``, ``inds,hyper:[N,W,B]``,
    ``log2_total,min_log2_total:[B]``, mins mirrored, ``keys:[B]`` PRNG.
    """

    __slots__ = ('c0', 'c1', 'par', 'inds', 'hyper', 'lcc', 'log2_total',
                 'min_log2_total', 'min_c0', 'min_c1', 'min_par',
                 'min_inds', 'keys')

    def __init__(self, c0, c1, par, inds, hyper, lcc, log2_total,
                 min_log2_total, min_c0, min_c1, min_par, min_inds, keys):
        self.c0 = c0
        self.c1 = c1
        self.par = par
        self.inds = inds
        self.hyper = hyper
        self.lcc = lcc
        self.log2_total = log2_total
        self.min_log2_total = min_log2_total
        self.min_c0 = min_c0
        self.min_c1 = min_c1
        self.min_par = min_par
        self.min_inds = min_inds
        self.keys = keys

    def tree_flatten(self):
        return ((self.c0, self.c1, self.par, self.inds, self.hyper,
                 self.lcc, self.log2_total, self.min_log2_total,
                 self.min_c0, self.min_c1, self.min_par, self.min_inds,
                 self.keys), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def init_batch(ctrees, seeds, log2_dims_padded, *, sparse_lanes=None,
               log2_n_projs=None, dtype=np.float32) -> SABatch:
    """Builds a replica-minor batch entirely on host (one device upload).

    Much faster than stacking per-replica device states when the device
    sits behind a network tunnel.
    """
    n = len(ctrees[0])
    n_leaves = ctrees[0].n_leaves
    b = len(ctrees)
    w = ctrees[0].inds_array.shape[1]
    log2d = np.asarray(log2_dims_padded, dtype=np.float64)

    # Benchmarks tile a few unique trees across many replicas; computing
    # the per-node caches once per UNIQUE tree and broadcasting the
    # columns keeps host setup O(unique) instead of O(B).
    uniq: dict[int, int] = {}
    col = np.empty(b, dtype=np.int64)
    uniq_trees = []
    for i, ctree in enumerate(ctrees):
        j = uniq.get(id(ctree))
        if j is None:
            j = uniq[id(ctree)] = len(uniq_trees)
            uniq_trees.append(ctree)
        col[i] = j
    if len(uniq_trees) < b:
        ub = init_batch(uniq_trees, [0] * len(uniq_trees),
                        log2_dims_padded, sparse_lanes=sparse_lanes,
                        log2_n_projs=log2_n_projs, dtype=dtype)
        seeds_arr = np.asarray([int(s) & 0xFFFFFFFF for s in seeds],
                               dtype=np.uint32)
        keys = np.stack([np.zeros_like(seeds_arr), seeds_arr], axis=1)
        # Upload the small unique batch and broadcast ON DEVICE: the
        # host-side fancy-index produced full [.., B] arrays that then
        # crawled through the tunnel (~650MB / several minutes at
        # Sycamore B=256).
        col_dev = jnp.asarray(col)
        expand_b = jax.jit(lambda x: jnp.asarray(x)[..., col_dev])
        return SABatch(expand_b(ub.c0), expand_b(ub.c1), expand_b(ub.par),
                       expand_b(ub.inds), expand_b(ub.hyper),
                       expand_b(ub.lcc), expand_b(ub.log2_total),
                       expand_b(ub.min_log2_total), expand_b(ub.min_c0),
                       expand_b(ub.min_c1), expand_b(ub.min_par),
                       expand_b(ub.min_inds), jnp.asarray(keys))

    c0 = np.empty((n, b), dtype=np.int32)
    c1 = np.empty((n, b), dtype=np.int32)
    par = np.empty((n, b), dtype=np.int32)
    inds = np.empty((n, w, b), dtype=np.uint32)
    for i, ctree in enumerate(ctrees):
        nodes = ctree.nodes_array
        c0[:, i] = nodes[:, 0]
        c1[:, i] = nodes[:, 1]
        par[:, i] = nodes[:, 2]
        inds[:, :, i] = ctree.inds_array

    internal = c0 >= 0
    c0s = np.where(internal, c0, 0)
    c1s = np.where(internal, c1, 0)
    gather = np.take_along_axis
    inds_c0 = gather(inds, c0s[:, None, :], axis=0)
    inds_c1 = gather(inds, c1s[:, None, :], axis=0)
    hyper = np.where(internal[:, None, :], inds & inds_c0 & inds_c1,
                     np.uint32(0))

    # log2 cost per node: width of union of children (+ sparse cap).
    # Accumulated word by word — a single [N, W, 32, B] float64 expansion
    # is multi-GB at Sycamore scale (the round-1 "wedged worker" was in
    # fact this array swapping the 1-core host for minutes).
    union = inds_c0 | inds_c1
    shifts = np.arange(32, dtype=np.uint32)
    log2d_w32 = log2d.reshape(w, 32)

    def w_of(lanes_nwb):
        out = np.zeros((n, b), dtype=np.float64)
        for word in range(w):
            bits = ((lanes_nwb[:, word, None, :] >>
                     shifts[None, :, None]) & 1).astype(np.float64)
            out += np.einsum('nsb,s->nb', bits, log2d_w32[word])
        return out

    if sparse_lanes is None:
        lcc = w_of(union)
    else:
        sp = np.asarray(sparse_lanes, dtype=np.uint32)
        dense = w_of(union & ~sp[None, :, None])
        sparse = w_of(union & sp[None, :, None])
        lcc = dense + np.minimum(sparse, float(log2_n_projs))
    lcc = np.where(internal, lcc, -np.inf).astype(dtype)

    internal_lcc = lcc[n_leaves:]
    m = internal_lcc.max(axis=0)
    lt = (m + np.log2(np.exp2(internal_lcc - m[None, :]).sum(axis=0))
          ).astype(dtype)

    # threefry PRNGKey(s) (without x64) == uint32 [0, s mod 2**32]; build
    # on host to avoid one device round-trip per replica.
    seeds_arr = np.asarray([int(s) & 0xFFFFFFFF for s in seeds],
                           dtype=np.uint32)
    keys = np.stack([np.zeros_like(seeds_arr), seeds_arr], axis=1)
    keys = jnp.asarray(keys)
    return SABatch(jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(par),
                   jnp.asarray(inds), jnp.asarray(hyper), jnp.asarray(lcc),
                   jnp.asarray(lt), jnp.asarray(lt), jnp.asarray(c0),
                   jnp.asarray(c1), jnp.asarray(par), jnp.asarray(inds),
                   keys)


def from_states(states) -> SABatch:
    """Stacks per-replica ``SAStateIM`` into a replica-minor batch."""
    stack = jax.tree.map(lambda *xs: jnp.stack(xs, axis=-1), *states)
    # stacked nodes: [N, 3, B] -> three [N, B]
    nodes = stack.nodes
    min_nodes = stack.min_nodes
    keys = jnp.stack([s.key for s in states])
    return SABatch(nodes[:, 0, :], nodes[:, 1, :], nodes[:, 2, :],
                   stack.inds, stack.hyper, stack.lcc, stack.log2_total,
                   stack.min_log2_total, min_nodes[:, 0, :],
                   min_nodes[:, 1, :], min_nodes[:, 2, :], stack.min_inds,
                   keys)


def replica_state(batch: SABatch, i: int):
    """Extracts replica ``i`` back into a ``SAStateIM``."""
    from tnco_tpu.kernels.sa_infinite import SAStateIM

    nodes = jnp.stack(
        [batch.c0[:, i], batch.c1[:, i], batch.par[:, i]], axis=1)
    min_nodes = jnp.stack(
        [batch.min_c0[:, i], batch.min_c1[:, i], batch.min_par[:, i]],
        axis=1)
    return SAStateIM(nodes, batch.inds[..., i], batch.hyper[..., i],
                     batch.lcc[:, i], batch.log2_total[i],
                     batch.min_log2_total[i], min_nodes,
                     batch.min_inds[..., i], batch.keys[i])


def _width_b(lanes_wb, log2d_w32, *, sparse_wb=None, log2_n_projs=None,
             uniform_log2=None):
    """Width of ``uint32[W, B]`` lane sets -> ``f32[B]``.

    Fast path: when every index dim is equal AND its log2 is an integer
    (``uniform_log2``, e.g. 1.0 for the ubiquitous bond-dim-2 networks),
    ``width = popcount * log2(dim)`` — BITWISE-equal to the pinned
    pairwise tree (integer-valued f32 sums and products are exact), so
    the cross-engine bit-identity invariant is preserved while the hot
    width drops from a materialized ``[W*32, ...]`` bit-plane halving
    tree to one popcount pass (the round-2 bench regression: the pinned
    tree on this path cost ~34% of multiwalk throughput, BENCH_r02).
    Non-integral or non-uniform dims keep the pinned tree.
    """
    if (uniform_log2 is not None and sparse_wb is None
            and float(uniform_log2).is_integer()):
        pc = jnp.sum(jax.lax.population_count(lanes_wb).astype(jnp.int32),
                     axis=0)
        return pc.astype(log2d_w32.dtype) * jnp.asarray(
            uniform_log2, log2d_w32.dtype)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    if sparse_wb is None:
        bits = ((lanes_wb[:, None, :] >> shifts[None, :, None]) &
                jnp.uint32(1)).astype(log2d_w32.dtype)
        # Same (w*32+s)-ordered pairwise halving as bitops.width: the two
        # lowerings must produce bit-identical widths (engine invariant).
        k = lanes_wb.shape[0] * 32
        terms = (bits * log2d_w32[:, :, None]).reshape(k, -1)
        n = k
        p = 1 << (n - 1).bit_length() if n > 1 else 1
        if p != n:
            terms = jnp.concatenate(
                [terms,
                 jnp.zeros((p - n,) + terms.shape[1:], terms.dtype)], axis=0)
        while terms.shape[0] > 1:
            h = terms.shape[0] // 2
            terms = terms[:h] + terms[h:]
        return terms[0].reshape(lanes_wb.shape[1:])
    dense = _width_b(lanes_wb & ~sparse_wb, log2d_w32,
                     uniform_log2=uniform_log2)
    sparse = _width_b(lanes_wb & sparse_wb, log2d_w32,
                      uniform_log2=uniform_log2)
    return dense + jnp.minimum(sparse, log2_n_projs)


def _log2_total_b(lcc, n_leaves):
    # Shared order-pinned reduction: bit-identical to the vmapped oracle
    # and to every other engine layout (see costs.pairwise_sum).
    return costs_ops.log2_total_from_lcc(lcc, n_leaves)


def compute_hyper_b(c0, c1, inds):
    """Full ``hyper`` recompute: ``inds[i] & inds[c0[i]] & inds[c1[i]]``."""
    internal = c0 >= 0
    c0s = jnp.where(internal, c0, 0)
    c1s = jnp.where(internal, c1, 0)
    inds_c0 = jnp.take_along_axis(inds, c0s[:, None, :], axis=0)
    inds_c1 = jnp.take_along_axis(inds, c1s[:, None, :], axis=0)
    return jnp.where(internal[:, None, :], inds & inds_c0 & inds_c1,
                     jnp.uint32(0))


def _sweep_batched(batch_tuple, beta, log2d_w32, cfg: SweepConfig, iota_n,
                   sparse_wb, log2_n_projs, uniform_log2=None):
    """One lockstep leaf-to-root sweep over all replicas.

    PRNG usage per replica matches ``sa_infinite.sweep`` exactly (one split
    at sweep start, three-way splits per walk step), so single-replica and
    batched execution produce identical trajectories.
    """
    (c0, c1, par, inds, lcc, _lt_prev, min_lt, min_c0, min_c1,
     min_par, min_inds, keys) = batch_tuple
    n_leaves = cfg.n_leaves

    split2 = jax.vmap(lambda k: tuple(jax.random.split(k)))
    split3 = jax.vmap(lambda k: tuple(jax.random.split(k, 3)))
    randleaf = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, n_leaves))
    bern = jax.vmap(jax.random.bernoulli)
    unif = jax.vmap(
        lambda k: jax.random.uniform(k, dtype=log2d_w32.dtype))

    keys, k_leaf = split2(keys)
    leaf = randleaf(k_leaf)  # [B]

    def row_mask(pos):
        return iota_n == pos[None, :]  # [N, B]

    def grow_i(arr_nb, mask):
        return jnp.sum(jnp.where(mask, arr_nb, 0), axis=0,
                       dtype=arr_nb.dtype)

    def grow_u(arr_nwb, mask):
        return jnp.sum(jnp.where(mask[:, None, :], arr_nwb,
                                 jnp.uint32(0)), axis=0, dtype=jnp.uint32)

    def grow_f(arr_nb, mask):
        return jnp.sum(jnp.where(mask, arr_nb, 0.0), axis=0)

    def width(lanes_wb):
        return _width_b(lanes_wb, log2d_w32, sparse_wb=sparse_wb,
                        log2_n_projs=log2_n_projs,
                        uniform_log2=uniform_log2)

    lt0 = _log2_total_b(lcc, n_leaves)
    m_leaf = row_mask(leaf)
    pos_b0 = grow_i(par, m_leaf)
    pos_b0 = jnp.where(leaf == NULL, NULL, pos_b0)  # leaf always valid

    if cfg.prob_kind == 'mh':
        def accept_fn(log2_u, l_new, l_old):
            return log2_u <= -beta * (l_new - l_old)
    elif cfg.prob_kind == 'greedy':
        def accept_fn(log2_u, l_new, l_old):
            return l_new <= l_old
    elif cfg.prob_kind == 'base':
        def accept_fn(log2_u, l_new, l_old):
            return jnp.ones_like(l_new, dtype=bool)
    else:
        raise ValueError(f"Unknown prob_kind: {cfg.prob_kind!r}")

    def cond(carry):
        active = carry[-1]
        return jnp.any(active)

    def body(carry):
        (c0, c1, par, inds, lcc, lt, pos_b, keys, moves,
         active) = carry

        keys_new, k_pick, k_u = split3(keys)

        b = pos_b
        m_b = row_mask(b)
        a = grow_i(par, m_b)
        c0b = grow_i(c0, m_b)
        c1b = grow_i(c1, m_b)
        m_a = row_mask(a)
        c0a = grow_i(c0, m_a)
        c1a = grow_i(c1, m_a)
        c = jnp.where(c0a == b, c1a, c0a)
        m_c = row_mask(c)

        inds_c = grow_u(inds, m_c)
        inds0 = grow_u(inds, row_mask(c0b))
        inds1 = grow_u(inds, row_mask(c1b))
        i0 = jnp.any(inds0 & inds_c, axis=0)
        i1 = jnp.any(inds1 & inds_c, axis=0)
        both = i0 & i1
        rand_bit = bern(k_pick)
        take0 = jnp.where(cfg.disable_shared_inds | both, rand_bit, i0)
        e = jnp.where(take0, c1b, c0b)
        m_e = row_mask(e)
        t0m = take0[None, :]
        inds_d = jnp.where(t0m, inds0, inds1)
        inds_e = jnp.where(t0m, inds1, inds0)

        inds_a = grow_u(inds, m_a)
        # hyper on the fly (exact integer identity hyper[i] =
        # inds[i] & inds[c0] & inds[c1]) -- saves carrying and rewriting
        # a full [N, W, B] array every walk step (HBM-bandwidth bound).
        inds_b = grow_u(inds, m_b)
        hyp_a = inds_a & inds_b & inds_c
        hyp_b = inds_b & inds0 & inds1
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        l_a = grow_f(lcc, m_a)
        l_b = grow_f(lcc, m_b)
        ln_b = width(inds_d | inds_c)
        ln_a = width(new_inds_b | inds_e)
        l_new = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b)

        u = unif(k_u)
        accept = active & accept_fn(jnp.log2(u), l_new, lt)
        acc = accept[None, :]

        # Swap C <-> E: row updates become masked wheres over N.
        c_bcast = jnp.broadcast_to(c[None, :], c0.shape)
        e_bcast = jnp.broadcast_to(e[None, :], c0.shape)
        b_bcast = jnp.broadcast_to(b[None, :], c0.shape)
        a_bcast = jnp.broadcast_to(a[None, :], c0.shape)
        upd_rows = m_a | m_b
        c0 = jnp.where(acc & upd_rows & (c0 == c_bcast), e_bcast,
                       jnp.where(acc & upd_rows & (c0 == e_bcast), c_bcast,
                                 c0))
        c1 = jnp.where(acc & upd_rows & (c1 == c_bcast), e_bcast,
                       jnp.where(acc & upd_rows & (c1 == e_bcast), c_bcast,
                                 c1))
        par = jnp.where(acc & m_c, b_bcast,
                        jnp.where(acc & m_e, a_bcast, par))

        accw = acc[:, None, :]
        inds = jnp.where(accw & m_b[:, None, :], new_inds_b[None], inds)
        lcc = jnp.where(acc & m_a, ln_a[None, :],
                        jnp.where(acc & m_b, ln_b[None, :], lcc))
        lt = jnp.where(accept, l_new, lt)

        # Advance the walk; inactive lanes keep their state (incl. keys).
        pos_b = jnp.where(active, a, pos_b)
        keys = jnp.where(
            active.reshape(active.shape + (1,) * (keys.ndim - 1)),
            keys_new, keys)
        moves = moves + jnp.sum(active, dtype=jnp.int32)

        # Next-step activity: b' = a must be a non-root internal node
        par_a = grow_i(par, row_mask(pos_b))
        next_active = active & (pos_b != NULL) & (par_a != NULL)

        return (c0, c1, par, inds, lcc, lt, pos_b, keys, moves,
                next_active)

    par_b0 = grow_i(par, row_mask(pos_b0))
    par_b0 = jnp.where(pos_b0 == NULL, NULL, par_b0)
    active0 = (pos_b0 != NULL) & (par_b0 != NULL)

    carry = (c0, c1, par, inds, lcc, lt0, pos_b0, keys,
             jnp.int32(0), active0)
    (c0, c1, par, inds, lcc, _, _, keys, moves,
     _) = jax.lax.while_loop(cond, body, carry)

    lt_final = _log2_total_b(lcc, n_leaves)
    improved = lt_final < min_lt
    impn = improved[None, :]
    impw = improved[None, None, :]
    min_lt = jnp.where(improved, lt_final, min_lt)
    min_c0 = jnp.where(impn, c0, min_c0)
    min_c1 = jnp.where(impn, c1, min_c1)
    min_par = jnp.where(impn, par, min_par)
    min_inds = jnp.where(impw, inds, min_inds)

    return ((c0, c1, par, inds, lcc, lt_final, min_lt, min_c0,
             min_c1, min_par, min_inds, keys), moves)


def _run(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
         sparse_wb=None, log2_n_projs=None, uniform_log2=None):
    n = batch.c0.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]

    def step(carry, beta):
        carry, moves = _sweep_batched(carry, beta, log2d_w32, cfg, iota_n,
                                      sparse_wb, log2_n_projs,
                                      uniform_log2)
        lt, min_lt = carry[5], carry[6]
        return carry, (lt, min_lt, moves)

    carry = (batch.c0, batch.c1, batch.par, batch.inds,
             batch.lcc, batch.log2_total, batch.min_log2_total,
             batch.min_c0, batch.min_c1, batch.min_par, batch.min_inds,
             batch.keys)
    carry, (lt_hist, min_hist, moves_hist) = jax.lax.scan(
        step, carry, betas)
    (c0, c1, par, inds, lcc, lt, min_lt, min_c0, min_c1, min_par,
     min_inds, keys) = carry
    # The sweeps compute hyper rows on the fly; refresh the stored array
    # once per run call so audits / extraction / engine switches see it.
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt,
                  min_c0, min_c1, min_par, min_inds, keys)
    return out, {'log2_total': lt_hist, 'log2_min_total': min_hist,
                 'moves': moves_hist}


run_sweeps_batched = fts.partial(
    jax.jit, static_argnames=('cfg', 'uniform_log2'))(_run)


def _stream_iter(carry, log2d_w32, betas, cfg: SweepConfig, iota_n,
                 sparse_wb, log2_n_projs, uniform_log2=None):
    """One iteration of the continuous move stream.

    Unlike the lockstep sweep (where the while-loop runs until the deepest
    replica's walk finishes and shallow lanes idle), every lane here is
    always busy: a lane that reaches the root closes its sweep (min
    snapshot + new leaf + next beta) in that iteration and immediately
    continues.  Per-lane semantics are unchanged — K sweeps over the beta
    ramp — only the lane synchronization (and hence the RNG stream) differs
    from the lockstep engines.
    """
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par,
     min_inds, keys, pos_b, sweep_cnt, moves) = carry
    n_leaves = cfg.n_leaves
    n_sweeps = betas.shape[0]

    split3 = jax.vmap(lambda k: tuple(jax.random.split(k, 3)))
    randleaf = jax.vmap(lambda k: jax.random.randint(k, (), 0, n_leaves))
    bern = jax.vmap(jax.random.bernoulli)
    unif = jax.vmap(
        lambda k: jax.random.uniform(k, dtype=log2d_w32.dtype))

    def row_mask(pos):
        return iota_n == pos[None, :]

    def grow_i(arr, mask):
        return jnp.sum(jnp.where(mask, arr, 0), axis=0,
                       dtype=arr.dtype)

    def grow_f(arr, mask):
        return jnp.sum(jnp.where(mask, arr, 0.0), axis=0)

    def grow_u(arr, mask):
        return jnp.sum(jnp.where(mask[:, None, :], arr, jnp.uint32(0)),
                       axis=0, dtype=jnp.uint32)

    def width(lanes_wb):
        return _width_b(lanes_wb, log2d_w32, sparse_wb=sparse_wb,
                        log2_n_projs=log2_n_projs,
                        uniform_log2=uniform_log2)

    keys, k_a, k_b = split3(keys)

    running = sweep_cnt < n_sweeps
    # Exact total every iteration: kills drift and avoids carrying lt.
    lt = _log2_total_b(lcc, n_leaves)

    m_pos = row_mask(pos_b)
    par_pos = grow_i(par, m_pos)
    at_boundary = running & ((pos_b == NULL) | (par_pos == NULL))
    walking = running & ~at_boundary

    # ---- Sweep boundary: min snapshot + new leaf --------------------------
    improved = at_boundary & (lt < min_lt)
    min_lt = jnp.where(improved, lt, min_lt)

    def snap(args):
        min_c0, min_c1, min_par, min_inds = args
        impn = improved[None, :]
        impw = improved[None, None, :]
        return (jnp.where(impn, c0, min_c0), jnp.where(impn, c1, min_c1),
                jnp.where(impn, par, min_par),
                jnp.where(impw, inds, min_inds))

    min_c0, min_c1, min_par, min_inds = jax.lax.cond(
        jnp.any(improved), snap, lambda a: a,
        (min_c0, min_c1, min_par, min_inds))

    leaf = randleaf(k_a)
    new_pos = grow_i(par, row_mask(leaf))
    pos_b = jnp.where(at_boundary, new_pos, pos_b)
    sweep_cnt = jnp.where(at_boundary, sweep_cnt + 1, sweep_cnt)

    # ---- Walk step for lanes mid-sweep ------------------------------------
    beta = jnp.take(betas, jnp.clip(sweep_cnt - 1, 0, n_sweeps - 1))

    b = jnp.where(walking, pos_b, 0)
    m_b = row_mask(b)
    a = grow_i(par, m_b)
    c0b = grow_i(c0, m_b)
    c1b = grow_i(c1, m_b)
    m_a = row_mask(a)
    c0a = grow_i(c0, m_a)
    c1a = grow_i(c1, m_a)
    c = jnp.where(c0a == b, c1a, c0a)
    m_c = row_mask(c)

    inds_c = grow_u(inds, m_c)
    inds0 = grow_u(inds, row_mask(c0b))
    inds1 = grow_u(inds, row_mask(c1b))
    i0 = jnp.any(inds0 & inds_c, axis=0)
    i1 = jnp.any(inds1 & inds_c, axis=0)
    both = i0 & i1
    rand_bit = bern(k_a)
    take0 = jnp.where(cfg.disable_shared_inds | both, rand_bit, i0)
    e = jnp.where(take0, c1b, c0b)
    m_e = row_mask(e)
    t0m = take0[None, :]
    inds_d = jnp.where(t0m, inds0, inds1)
    inds_e = jnp.where(t0m, inds1, inds0)

    inds_a = grow_u(inds, m_a)
    inds_b = grow_u(inds, m_b)
    hyp_a = inds_a & inds_b & inds_c
    hyp_b = inds_b & inds0 & inds1
    new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

    l_a = grow_f(lcc, m_a)
    l_b = grow_f(lcc, m_b)
    ln_b = width(inds_d | inds_c)
    ln_a = width(new_inds_b | inds_e)
    l_new = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b)

    u = unif(k_b)
    if cfg.prob_kind == 'mh':
        acc = jnp.log2(u) <= -beta * (l_new - lt)
    elif cfg.prob_kind == 'greedy':
        acc = l_new <= lt
    else:
        acc = jnp.ones_like(l_new, dtype=bool)
    accept = walking & acc
    accn = accept[None, :]

    c_bcast = jnp.broadcast_to(c[None, :], c0.shape)
    e_bcast = jnp.broadcast_to(e[None, :], c0.shape)
    b_bcast = jnp.broadcast_to(b[None, :], c0.shape)
    a_bcast = jnp.broadcast_to(a[None, :], c0.shape)
    upd = accn & (m_a | m_b)
    c0 = jnp.where(upd & (c0 == c_bcast), e_bcast,
                   jnp.where(upd & (c0 == e_bcast), c_bcast, c0))
    c1 = jnp.where(upd & (c1 == c_bcast), e_bcast,
                   jnp.where(upd & (c1 == e_bcast), c_bcast, c1))
    par = jnp.where(accn & m_c, b_bcast,
                    jnp.where(accn & m_e, a_bcast, par))

    accw = accn[:, None, :]
    inds = jnp.where(accw & m_b[:, None, :], new_inds_b[None], inds)
    lcc = jnp.where(accn & m_a, ln_a[None, :],
                    jnp.where(accn & m_b, ln_b[None, :], lcc))

    pos_b = jnp.where(walking, a, pos_b)
    moves = moves + jnp.sum(walking, dtype=jnp.int32)

    return (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1,
            min_par, min_inds, keys, pos_b, sweep_cnt, moves)


def _run_stream(batch: SABatch, betas, n_iters: int, log2d_w32,
                cfg: SweepConfig, pos_b, sweep_cnt, sparse_wb=None,
                log2_n_projs=None, uniform_log2=None):
    n = batch.c0.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]

    def step(carry, _):
        carry = _stream_iter(carry, log2d_w32, betas, cfg, iota_n,
                             sparse_wb, log2_n_projs, uniform_log2)
        return carry, None

    carry = (batch.c0, batch.c1, batch.par, batch.inds,
             batch.lcc, batch.min_log2_total, batch.min_c0, batch.min_c1,
             batch.min_par, batch.min_inds, batch.keys,
             pos_b, sweep_cnt, jnp.int32(0))
    carry, _ = jax.lax.scan(step, carry, None, length=n_iters)
    (c0, c1, par, inds, lcc, min_lt, min_c0, min_c1, min_par,
     min_inds, keys, pos_b, sweep_cnt, moves) = carry
    hyper = compute_hyper_b(c0, c1, inds)
    lt = _log2_total_b(lcc, cfg.n_leaves)
    # Final boundary handling: lanes that just reached the root still owe
    # a min comparison for their last sweep.
    at_root = (pos_b == NULL) | (
        jnp.sum(jnp.where(jnp.arange(n, dtype=jnp.int32)[:, None] ==
                          pos_b[None, :], par, 0), axis=0) == NULL)
    improved = at_root & (lt < min_lt)
    min_lt = jnp.where(improved, lt, min_lt)
    impn, impw = improved[None, :], improved[None, None, :]
    min_c0 = jnp.where(impn, c0, min_c0)
    min_c1 = jnp.where(impn, c1, min_c1)
    min_par = jnp.where(impn, par, min_par)
    min_inds = jnp.where(impw, inds, min_inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt, min_c0,
                  min_c1, min_par, min_inds, keys)
    return out, {'moves': moves, 'pos_b': pos_b, 'sweep_cnt': sweep_cnt}


run_stream_batched = fts.partial(
    jax.jit, static_argnames=('cfg', 'n_iters', 'uniform_log2'))(_run_stream)
