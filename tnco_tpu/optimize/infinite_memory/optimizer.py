"""Infinite-memory SA optimizer wrapper.

Label-space, stateful front-end over the jitted kernel in
:mod:`tnco_tpu.kernels.sa_infinite`, with the reference wrapper's API
(tnco/optimize/infinite_memory/optimizer.py:28-251): ``update(prob)``,
``min_ctree``, Decimal ``total_cost``, ``log2_min_total_cost``,
``prng_state`` (resumable), pickling, and a full ``is_valid`` cache audit.

The Decimal costs are *exact* (Python bigints) — this framework does not
need the reference's 1024-bit floats (include/tnco/fixed_float.hpp).
"""

from decimal import Decimal
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_infinite as sa
from tnco_tpu.ops import bitops
from tnco_tpu.optimize.infinite_memory.cost_model import SimpleCostModel
from tnco_tpu.optimize.prob import BaseProbability

__all__ = ['Optimizer']


def key_to_state(key) -> str:
    """Serializes a JAX PRNG key to a hex string (reference ``prng_state``,
    optimize/optimizer.hpp:191-195, serialized the mt19937 stream)."""
    data = np.asarray(jax.random.key_data(key), dtype=np.uint32)
    return 'jaxkey:' + data.tobytes().hex()


def state_to_key(state: str):
    if not state.startswith('jaxkey:'):
        raise ValueError("Not a valid PRNG state string.")
    data = np.frombuffer(bytes.fromhex(state[len('jaxkey:'):]),
                         dtype=np.uint32)
    return jax.random.wrap_key_data(jnp.asarray(data))


def resolve_seed(seed):
    """int | state-string | None -> PRNG key (None draws a random seed)."""
    if seed is None:
        import secrets
        return jax.random.PRNGKey(secrets.randbits(32))
    if isinstance(seed, str):
        return state_to_key(seed)
    return jax.random.PRNGKey(int(seed))


def log2_close(x: float, y: float, atol: float) -> bool:
    """|ln-cost difference| <= atol on log2 values (reference is_logclose,
    include/tnco/utils.hpp:79-87, works on natural logs of linear costs)."""
    if math.isinf(x) or math.isinf(y):
        return x == y
    return abs(x - y) * math.log(2) <= atol


class Optimizer:
    """Simulated-annealing optimizer with no memory constraint.

    Args:
        ctree: Initial contraction tree.
        cmodel: :class:`SimpleCostModel`.
        seed: int seed, a ``prng_state`` string, or None (random).
        disable_shared_inds: Allow proposals that break the shared-index
            guarantee.
        atol: Tolerance used by :meth:`is_valid`.
        min_ctree: Optional best-so-far tree to resume from.
    """

    def __init__(self,
                 ctree: ContractionTree,
                 cmodel: SimpleCostModel,
                 *,
                 seed=None,
                 disable_shared_inds: bool = False,
                 atol: float = 1e-5,
                 min_ctree: ContractionTree | None = None) -> None:
        if not isinstance(ctree, ContractionTree):
            raise TypeError("'ctree' must be a ContractionTree.")
        self._template = ctree
        self._cmodel = cmodel
        self._atol = float(atol)
        self.disable_shared_inds = bool(disable_shared_inds)

        n_lanes = ctree.inds_array.shape[1]
        self._cfg = sa.SweepConfig(n_leaves=ctree.n_leaves,
                                   n_lanes=n_lanes,
                                   disable_shared_inds=disable_shared_inds)
        # cost_type selects the device dtype (f64 under JAX x64 mode;
        # see bitops.device_dtype) — every downstream array follows it.
        self._log2d = bitops.pad_log2_dims(
            ctree.log2_dims_array, n_lanes,
            dtype=bitops.device_dtype(getattr(cmodel, 'cost_type',
                                              'float64')))
        dev = cmodel.device_params(ctree.inds_order)
        self._sparse_lanes = (None if dev['sparse_lanes'] is None else
                              jnp.asarray(dev['sparse_lanes']))
        self._log2_n_projs = dev['log2_n_projs']

        key = resolve_seed(seed)
        self._state = sa.init_state(ctree, key, self._log2d,
                                    sparse_lanes=self._sparse_lanes,
                                    log2_n_projs=self._log2_n_projs)
        if min_ctree is not None:
            if (min_ctree.inds_order != ctree.inds_order or
                    len(min_ctree) != len(ctree)):
                raise ValueError("'min_ctree' is not consistent with "
                                 "'ctree'.")
            min_state = sa.init_state(min_ctree, key, self._log2d,
                                      sparse_lanes=self._sparse_lanes,
                                      log2_n_projs=self._log2_n_projs)
            self._state = sa.SAStateIM(
                self._state.nodes, self._state.inds, self._state.hyper,
                self._state.lcc, self._state.log2_total,
                min_state.log2_total, min_state.nodes, min_state.inds, key)

        valid, msg = self.is_valid(atol=atol, return_message=True)
        if not valid:
            raise ValueError(msg)

    # -- Optimization ---------------------------------------------------------

    def update(self, prob: BaseProbability) -> None:
        """One SA sweep (reference update,
        infinite_memory/optimizer.hpp:90-221)."""
        beta = getattr(prob, 'beta', 0.0)
        betas = jnp.full((1,), beta, dtype=self._log2d.dtype)
        cfg = sa.SweepConfig(n_leaves=self._cfg.n_leaves,
                             n_lanes=self._cfg.n_lanes,
                             disable_shared_inds=self.disable_shared_inds,
                             prob_kind=prob.kind)
        self._state, _ = sa.run_sweeps(self._state, betas, self._log2d, cfg,
                                       self._sparse_lanes,
                                       self._log2_n_projs)

    def update_many(self, prob: BaseProbability, betas) -> dict:
        """Chunked sweeps: one sweep per beta; returns per-sweep metrics."""
        betas = jnp.asarray(betas, dtype=self._log2d.dtype)
        cfg = sa.SweepConfig(n_leaves=self._cfg.n_leaves,
                             n_lanes=self._cfg.n_lanes,
                             disable_shared_inds=self.disable_shared_inds,
                             prob_kind=prob.kind)
        self._state, metrics = sa.run_sweeps(self._state, betas,
                                             self._log2d, cfg,
                                             self._sparse_lanes,
                                             self._log2_n_projs)
        return {k: np.asarray(v) for k, v in metrics.items()}

    # -- Views ----------------------------------------------------------------

    @property
    def ctree(self) -> ContractionTree:
        return sa.state_to_ctree(self._template, self._state.nodes,
                                 self._state.inds)

    @property
    def min_ctree(self) -> ContractionTree:
        return sa.state_to_ctree(self._template, self._state.min_nodes,
                                 self._state.min_inds)

    @property
    def cmodel(self) -> SimpleCostModel:
        return self._cmodel

    def _exact_total(self, ctree: ContractionTree) -> int:
        if not self._cmodel.sparse_inds:
            return ctree.total_cost_exact()
        total = 0
        inds = ctree.inds
        for node_pos, node in enumerate(ctree.nodes):
            if node.is_leaf():
                continue
            total += self._cmodel.contraction_cost(
                inds[node.children[0]], inds[node.children[1]],
                inds[node_pos], ctree.dims)
        return total

    @property
    def total_cost(self) -> Decimal:
        """Exact current total cost."""
        return Decimal(self._exact_total(self.ctree))

    @property
    def min_total_cost(self) -> Decimal:
        """Exact best total cost."""
        return Decimal(self._exact_total(self.min_ctree))

    @property
    def log2_total_cost(self) -> float:
        return float(self._state.log2_total)

    @property
    def log2_min_total_cost(self) -> float:
        return float(self._state.min_log2_total)

    @property
    def prng_state(self) -> str:
        return key_to_state(self._state.key)

    # -- Audit ----------------------------------------------------------------

    def is_valid(self, *, atol: float | None = None,
                 return_message: bool = False):
        """Structure + cache audit (reference
        infinite_memory/optimizer.hpp:223-251)."""
        atol = self._atol if atol is None else float(atol)
        ok, msg = self._is_valid_impl(atol)
        return (ok, msg) if return_message else ok

    def _is_valid_impl(self, atol):
        check = not self.disable_shared_inds
        cur, best = self.ctree, self.min_ctree
        for tree, name in ((cur, 'ctree'), (best, 'min_ctree')):
            ok, msg = tree.is_valid(check_shared_inds=check,
                                    return_message=True)
            if not ok:
                return False, f'{name}: {msg}'

        # Cost cache audit: recompute with the same device arithmetic.
        lcc_ref = sa.compute_lcc(self._state.nodes, self._state.inds,
                                 self._log2d,
                                 sparse_lanes=self._sparse_lanes,
                                 log2_n_projs=self._log2_n_projs)
        got = np.asarray(self._state.lcc)[self._cfg.n_leaves:]
        want = np.asarray(lcc_ref)[self._cfg.n_leaves:]
        if not np.allclose(got, want, atol=max(atol, 1e-5),
                           rtol=1e-5):
            return False, "CostCache is not properly cached."

        hyper_ref = sa.compute_hyper(self._state.nodes, self._state.inds)
        if not np.array_equal(np.asarray(self._state.hyper),
                              np.asarray(hyper_ref)):
            return False, "HyperCache is not properly cached."

        # Min-cost consistency (same arithmetic as the kernel).
        min_state = sa.init_state(best, self._state.key, self._log2d,
                                  sparse_lanes=self._sparse_lanes,
                                  log2_n_projs=self._log2_n_projs)
        if not log2_close(float(min_state.log2_total),
                          float(self._state.min_log2_total),
                          max(atol, 1e-4)):
            return False, "Cost for min ctree is not correct."
        return True, ""

    # -- Pickle ---------------------------------------------------------------

    @classmethod
    def __build__(cls, ctree, cmodel, seed, disable_shared_inds, atol,
                  min_ctree):
        return cls(ctree, cmodel, seed=seed,
                   disable_shared_inds=disable_shared_inds, atol=atol,
                   min_ctree=min_ctree)

    def __reduce__(self):
        return type(self).__build__, (self.ctree, self._cmodel,
                                      self.prng_state,
                                      self.disable_shared_inds, self._atol,
                                      self.min_ctree)

    def __eq__(self, other: Any) -> bool:
        return (type(self) is type(other) and self.ctree == other.ctree and
                self.min_ctree == other.min_ctree and
                self._cmodel == other._cmodel and
                self.prng_state == other.prng_state)

    def __repr__(self) -> str:
        return (f'Optimizer(n_nodes={len(self._template)}, '
                f'log2_min_total_cost={self.log2_min_total_cost:.4f})')
