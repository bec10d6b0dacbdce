"""Checkpoint / resume for replica batches.

The reference checkpoints through pickle everywhere, including the full
mt19937 stream (SURVEY.md §5: optimize/optimizer.hpp:191-195,
optimizer.py:234-251).  Here the replica state is a pytree of arrays +
counter-based PRNG keys, so a checkpoint is a plain ``.npz`` (no pickle
needed, safe to load) that fully resumes the annealing stream.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tnco_tpu.kernels.sa_batched import SABatch

__all__ = ['save_batch', 'load_batch', 'save_runner', 'load_runner']

_FIELDS = ('c0', 'c1', 'par', 'inds', 'hyper', 'lcc', 'log2_total',
           'min_log2_total', 'min_c0', 'min_c1', 'min_par', 'min_inds',
           'keys')


def save_batch(path, batch: SABatch, **extra) -> None:
    """Saves a ``SABatch`` (plus metadata arrays) to ``path`` (.npz)."""
    arrays = {f: np.asarray(getattr(batch, f)) for f in _FIELDS}
    arrays.update({f'extra_{k}': np.asarray(v) for k, v in extra.items()})
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_batch(path):
    """Loads ``(SABatch, extra_dict)`` saved by :func:`save_batch`."""
    data = np.load(Path(path))
    batch = SABatch(*(jnp.asarray(data[f]) for f in _FIELDS))
    extra = {
        k[len('extra_'):]: data[k]
        for k in data.files if k.startswith('extra_')
    }
    return batch, extra


def save_runner(path, runner) -> None:
    """Checkpoints a :class:`~tnco_tpu.parallel.ReplicaRunner`."""
    extra = dict(sweeps_done=runner.sweeps_done,
                 moves_done=runner.moves_done)
    if getattr(runner, '_mw_pos', None) is not None:
        extra['mw_pos'] = np.asarray(runner._mw_pos)
    save_batch(path, runner.states, **extra)


def load_runner(path, runner) -> None:
    """Restores a checkpoint into an already-constructed runner.

    The runner must have been built from the same trees (shapes must
    match); the saved arrays replace its state.
    """
    batch, extra = load_batch(path)
    if batch.c0.shape != runner.states.c0.shape:
        raise ValueError("Checkpoint shape does not match the runner.")
    runner.states = batch
    if 'mw_pos' in extra:
        pos = np.asarray(extra['mw_pos'])
        n_walks = getattr(runner, 'n_walks', None)
        if n_walks is not None and pos.shape[0] != n_walks:
            raise ValueError(
                f"Checkpoint has {pos.shape[0]} walks but the runner was "
                f"built with n_walks={n_walks}.")
        runner._mw_pos = jnp.asarray(pos)
    runner.sweeps_done = int(extra.get('sweeps_done', 0))
    runner.moves_done = int(extra.get('moves_done', 0))
