"""Infinite-memory simulated-annealing kernel (JAX, vmap-able).

One ``sweep`` reproduces the reference SA update
(include/tnco/optimize/infinite_memory/optimizer.hpp:90-221): pick a random
leaf, walk to the root, and at every internal node ``B`` propose swapping
``B``'s uncle ``C`` with one child ``E`` (the kept child ``D`` is guaranteed
to share an index with ``C`` unless ``disable_shared_inds``,
optimize/optimizer.hpp:86-172), Metropolis-accept on the log2-domain delta of
the two affected contraction costs, and update the index/hyper/cost caches
incrementally.

TPU design notes:
- The whole replica state is a pytree of fixed-shape arrays, so the sweep
  ``vmap``s over thousands of replicas per chip.
- The walk is a ``lax.while_loop``; under ``vmap`` it runs until the deepest
  replica finishes, masking the rest — replicas anneal in lockstep so depths
  are statistically matched.
- All costs live in the log2 domain; the total is re-derived from the
  per-node log-costs at the start of every sweep (a cheap masked logsumexp),
  so incremental float error never accumulates across sweeps.
"""

from dataclasses import dataclass
import functools as fts

import jax
import jax.numpy as jnp
import numpy as np

from tnco_tpu.ops import bitops
from tnco_tpu.ops import costs as costs_ops
from tnco_tpu import ctree as ctree_mod

__all__ = ['SweepConfig', 'SAStateIM', 'init_state', 'sweep', 'run_sweeps',
           'run_sweeps_batch']

NULL = -1


@dataclass(frozen=True)
class SweepConfig:
    """Static kernel configuration (hashable; becomes a jit static arg)."""
    n_leaves: int
    n_lanes: int
    disable_shared_inds: bool = False
    prob_kind: str = 'mh'  # 'mh' | 'greedy' | 'base'
    use_sparse: bool = False


@jax.tree_util.register_pytree_node_class
class SAStateIM:
    """Per-replica SA state (pytree).

    Fields mirror the reference optimizer's mutable members
    (infinite_memory/optimizer.hpp:56-59 + optimize/optimizer.hpp:44-49):
    tree arrays, per-node index bitsets, the hyper cache
    (``out & c0 & c1``, infinite_memory/utils.hpp:68-100), per-node log2
    contraction costs (CostCache, utils.hpp:22-66, in log domain), the
    min-so-far snapshot, and the PRNG key (replacing mt19937).
    """

    __slots__ = ('nodes', 'inds', 'hyper', 'lcc', 'log2_total',
                 'min_log2_total', 'min_nodes', 'min_inds', 'key')

    def __init__(self, nodes, inds, hyper, lcc, log2_total, min_log2_total,
                 min_nodes, min_inds, key):
        self.nodes = nodes
        self.inds = inds
        self.hyper = hyper
        self.lcc = lcc
        self.log2_total = log2_total
        self.min_log2_total = min_log2_total
        self.min_nodes = min_nodes
        self.min_inds = min_inds
        self.key = key

    def tree_flatten(self):
        return ((self.nodes, self.inds, self.hyper, self.lcc,
                 self.log2_total, self.min_log2_total, self.min_nodes,
                 self.min_inds, self.key), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


def compute_hyper(nodes, inds):
    """Vectorized hyper cache: ``out & c0 & c1`` per internal node.

    Reference: infinite_memory/utils.hpp:68-100 (leaves get empty sets).
    """
    internal = nodes[:, 0] != NULL
    c0 = jnp.where(internal, nodes[:, 0], 0)
    c1 = jnp.where(internal, nodes[:, 1], 0)
    hyper = inds & inds[c0] & inds[c1]
    return jnp.where(internal[:, None], hyper, jnp.zeros_like(hyper))


def compute_lcc(nodes, inds, log2_dims_padded, *, sparse_lanes=None,
                log2_n_projs=None):
    """Vectorized per-node log2 contraction costs (leaves -> -inf)."""
    internal = nodes[:, 0] != NULL
    c0 = jnp.where(internal, nodes[:, 0], 0)
    c1 = jnp.where(internal, nodes[:, 1], 0)
    union = inds[c0] | inds[c1]
    lcc = costs_ops.ccost_log2(union, log2_dims_padded,
                               sparse_lanes=sparse_lanes,
                               log2_n_projs=log2_n_projs)
    return jnp.where(internal, lcc, -jnp.inf).astype(log2_dims_padded.dtype)


def init_state(ctree: 'ctree_mod.ContractionTree', seed,
               log2_dims_padded=None, dtype=jnp.float32, *,
               sparse_lanes=None, log2_n_projs=None) -> SAStateIM:
    """Builds the device state for one replica from a host tree."""
    nodes = jnp.asarray(ctree.nodes_array, dtype=jnp.int32)
    inds = jnp.asarray(ctree.inds_array, dtype=jnp.uint32)
    if log2_dims_padded is None:
        log2_dims_padded = bitops.pad_log2_dims(ctree.log2_dims_array,
                                                inds.shape[1], dtype)
    hyper = compute_hyper(nodes, inds)
    lcc = compute_lcc(nodes, inds, log2_dims_padded,
                      sparse_lanes=sparse_lanes, log2_n_projs=log2_n_projs)
    lt = costs_ops.log2_total_from_lcc(lcc, ctree.n_leaves)
    key = seed if isinstance(seed, jax.Array) else \
        jax.random.PRNGKey(int(seed))
    return SAStateIM(nodes, inds, hyper, lcc, lt, lt, nodes, inds, key)


def _accept_fn(cfg: SweepConfig):
    if cfg.prob_kind == 'mh':
        return costs_ops.mh_log2_accept
    if cfg.prob_kind == 'greedy':
        return lambda log2_u, beta, l_new, l_old: l_new <= l_old
    if cfg.prob_kind == 'base':
        return lambda log2_u, beta, l_new, l_old: jnp.bool_(True)
    raise ValueError(f"Unknown prob_kind: {cfg.prob_kind!r}")


def sweep(state: SAStateIM, beta, log2_dims_padded, cfg: SweepConfig,
          sparse_lanes=None, log2_n_projs=None) -> SAStateIM:
    """One leaf-to-root SA sweep (the reference ``update``)."""
    accept_fn = _accept_fn(cfg)
    n_leaves = cfg.n_leaves

    key, k_leaf = jax.random.split(state.key)
    leaf = jax.random.randint(k_leaf, (), 0, n_leaves)
    pos_b0 = state.nodes[leaf, 2]

    # Drift-free total at sweep entry.
    lt0 = costs_ops.log2_total_from_lcc(state.lcc, n_leaves)

    def ccost(union):
        return costs_ops.ccost_log2(union, log2_dims_padded,
                                    sparse_lanes=sparse_lanes,
                                    log2_n_projs=log2_n_projs)

    def cond(carry):
        nodes, _, _, _, _, pos_b, _, _ = carry
        return (pos_b != NULL) & (nodes[pos_b, 2] != NULL)

    def body(carry):
        nodes, inds, hyper, lcc, lt, pos_b, key, moves = carry
        key, k_pick, k_u = jax.random.split(key, 3)

        b = pos_b
        a = nodes[b, 2]
        c0b, c1b = nodes[b, 0], nodes[b, 1]
        c0a, c1a = nodes[a, 0], nodes[a, 1]
        c = jnp.where(c0a == b, c1a, c0a)

        inds_c = inds[c]
        inds0, inds1 = inds[c0b], inds[c1b]
        i0 = bitops.any_bits(inds0 & inds_c)
        i1 = bitops.any_bits(inds1 & inds_c)
        rand_bit = jax.random.bernoulli(k_pick)
        # D must share an index with C unless disabled
        # (optimize/optimizer.hpp:127-144); random tie-break when both do.
        both = i0 & i1
        take0 = jnp.where(cfg.disable_shared_inds | both, rand_bit, i0)
        d = jnp.where(take0, c0b, c1b)
        e = jnp.where(take0, c1b, c0b)
        inds_d = jnp.where(take0, inds0, inds1)
        inds_e = jnp.where(take0, inds1, inds0)

        inds_a = inds[a]
        hyp_a, hyp_b = hyper[a], hyper[b]
        new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

        l_a, l_b = lcc[a], lcc[b]
        ln_b = ccost(inds_d | inds_c)
        ln_a = ccost(new_inds_b | inds_e)
        l_new = costs_ops.new_total_log2(lt, l_a, l_b, ln_a, ln_b)

        u = jax.random.uniform(k_u, dtype=lt.dtype)
        accept = accept_fn(jnp.log2(u), beta, l_new, lt)

        # Swap C <-> E (tree.hpp:141-192, array form: 4 row updates).
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
        lcc = lcc.at[a].set(jnp.where(accept, ln_a, l_a))
        lcc = lcc.at[b].set(jnp.where(accept, ln_b, l_b))
        lt = jnp.where(accept, l_new, lt)

        return nodes, inds, hyper, lcc, lt, a, key, moves + 1

    carry = (state.nodes, state.inds, state.hyper, state.lcc, lt0, pos_b0,
             key, jnp.int32(0))
    nodes, inds, hyper, lcc, _, _, key, moves = jax.lax.while_loop(
        cond, body, carry)

    # Re-derive the total exactly from the caches and update the min snapshot
    # (reference: optimizer.hpp:198-201).
    lt_final = costs_ops.log2_total_from_lcc(lcc, n_leaves)
    improved = lt_final < state.min_log2_total
    min_log2_total = jnp.where(improved, lt_final, state.min_log2_total)
    min_nodes = jnp.where(improved, nodes, state.min_nodes)
    min_inds = jnp.where(improved, inds, state.min_inds)

    new_state = SAStateIM(nodes, inds, hyper, lcc, lt_final, min_log2_total,
                          min_nodes, min_inds, key)
    return new_state, moves


def _run_sweeps(state: SAStateIM, betas, log2_dims_padded, cfg: SweepConfig,
                sparse_lanes=None, log2_n_projs=None):
    """Runs one sweep per beta; returns final state + per-sweep metrics."""

    def step(s, beta):
        s, moves = sweep(s, beta, log2_dims_padded, cfg, sparse_lanes,
                         log2_n_projs)
        return s, (s.log2_total, s.min_log2_total, moves)

    state, (lt_hist, min_hist, moves_hist) = jax.lax.scan(step, state, betas)
    return state, {'log2_total': lt_hist, 'log2_min_total': min_hist,
                   'moves': moves_hist}


run_sweeps = fts.partial(jax.jit, static_argnames=('cfg',))(_run_sweeps)


@fts.partial(jax.jit, static_argnames=('cfg',))
def run_sweeps_batch(states: SAStateIM, betas, log2_dims_padded,
                     cfg: SweepConfig, sparse_lanes=None, log2_n_projs=None):
    """vmap of :func:`run_sweeps` over a leading replica axis."""

    def one(s):
        return _run_sweeps(s, betas, log2_dims_padded, cfg, sparse_lanes,
                           log2_n_projs)

    return jax.vmap(one)(states)


def state_to_ctree(template: 'ctree_mod.ContractionTree', nodes,
                   inds) -> 'ctree_mod.ContractionTree':
    """Rebuilds a host ``ContractionTree`` from device arrays."""
    return template.replace_arrays(np.asarray(nodes), np.asarray(inds))
