"""ctypes bindings for the native host core (C++17).

Builds ``core.cpp`` on first use (g++ -O3 -shared) and exposes:

- :func:`validate` — fast flat-tree + contraction validation;
- :func:`total_cost` — exact big-integer total cost (Decimal + log2);
- :func:`sa_run` — multithreaded CPU SA engine over replica batches.

The compiled library is cached next to the source; set
``TNCO_TPU_NO_NATIVE=1`` to disable (pure-Python fallbacks are used by the
callers in that case).
"""

import ctypes
import os
from pathlib import Path
import subprocess
import threading

import numpy as np

__all__ = ['available', 'validate', 'total_cost', 'sa_run']

_HERE = Path(__file__).parent
_SRC = _HERE / 'core.cpp'
_LIB_PATH = _HERE / '_tnco_native.so'
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = [
        'g++', '-O3', '-march=native', '-std=c++17', '-shared', '-fPIC',
        '-o', str(_LIB_PATH), str(_SRC), '-lpthread'
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get('TNCO_TPU_NO_NATIVE'):
            return None
        if (not _LIB_PATH.exists() or
                _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None

        lib.tnco_validate.restype = ctypes.c_int32
        lib.tnco_validate.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32
        ]
        lib.tnco_total_cost.restype = ctypes.c_int64
        lib.tnco_total_cost.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
            ctypes.c_int64
        ]
        lib.tnco_sa_run.restype = ctypes.c_int64
        lib.tnco_sa_run.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


_ERRORS = {
    1: 'Nodes are not valid',
    2: 'Last node should be root.',
    3: 'There should be only one root.',
    4: 'All leaves should be first.',
    5: 'Number of nodes is not consistent with the number of leaves.',
    6: 'Tree is not valid.',
    7: 'Contraction is not valid.',
    8: 'Contraction is not valid.',
}


def validate(nodes: np.ndarray, inds: np.ndarray,
             check_shared_inds: bool = False):
    """(ok, message) for a flat tree; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    inds = np.ascontiguousarray(inds, dtype=np.uint32)
    code = lib.tnco_validate(nodes.ctypes.data, len(nodes),
                             inds.ctypes.data, inds.shape[1],
                             int(check_shared_inds))
    return (code == 0, _ERRORS.get(code, ''))


def total_cost(nodes: np.ndarray, inds: np.ndarray, dims: np.ndarray):
    """(decimal_string, log2) exact total cost; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    inds = np.ascontiguousarray(inds, dtype=np.uint32)
    w = inds.shape[1]
    dims_padded = np.zeros(w * 32, dtype=np.int64)
    dims = np.asarray(dims, dtype=np.int64)
    dims_padded[:len(dims)] = dims
    log2_out = ctypes.c_double()
    needed = lib.tnco_total_cost(nodes.ctypes.data, len(nodes),
                                 inds.ctypes.data, w,
                                 dims_padded.ctypes.data,
                                 ctypes.byref(log2_out), None, 0)
    buf = ctypes.create_string_buffer(int(needed))
    lib.tnco_total_cost(nodes.ctypes.data, len(nodes), inds.ctypes.data, w,
                        dims_padded.ctypes.data, ctypes.byref(log2_out),
                        buf, needed)
    return buf.value.decode(), float(log2_out.value)


def sa_run(nodes: np.ndarray, inds: np.ndarray, log2_dims: np.ndarray,
           betas, seeds, n_threads: int = 0, *, return_final: bool = False):
    """Multithreaded CPU SA over a replica batch.

    Args:
        nodes: ``int32[R, N, 3]`` — updated in place: with each replica's
            best tree (default), or its final tree when ``return_final``.
        inds: ``uint32[R, N, W]`` — updated in place (same convention).
        log2_dims: ``float64[n_inds]``.
        betas: one beta per sweep.
        seeds: ``uint64[R]``.
        n_threads: 0 = all cores.
        return_final: chunked-resume mode — the in-place arrays keep the
            final trees and the best trees are returned separately.

    Returns:
        ``(best_log2, total_moves, nodes, inds)`` or, with
        ``return_final``, ``(best_log2, total_moves, nodes, inds,
        best_nodes, best_inds)``; None if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    inds = np.ascontiguousarray(inds, dtype=np.uint32)
    r, n, w = inds.shape
    log2d = np.zeros(w * 32, dtype=np.float64)
    log2_dims = np.asarray(log2_dims, dtype=np.float64)
    log2d[:len(log2_dims)] = log2_dims
    betas = np.ascontiguousarray(betas, dtype=np.float64)
    seeds = np.ascontiguousarray(seeds, dtype=np.uint64)
    best = np.zeros(r, dtype=np.float64)
    if return_final:
        best_nodes = np.zeros_like(nodes)
        best_inds = np.zeros_like(inds)
        bn, bi = best_nodes.ctypes.data, best_inds.ctypes.data
    else:
        best_nodes = best_inds = None
        bn = bi = None
    moves = lib.tnco_sa_run(nodes.ctypes.data, inds.ctypes.data, r, n, w,
                            log2d.ctypes.data, len(log2_dims),
                            betas.ctypes.data, len(betas),
                            seeds.ctypes.data, best.ctypes.data, bn, bi,
                            int(n_threads))
    if return_final:
        return best, int(moves), nodes, inds, best_nodes, best_inds
    return best, int(moves), nodes, inds


def sa_run_fw(nodes, inds, slices, log2_dims, skip_lanes, max_width,
              betas, seeds, reslice_every: int = 10, n_threads: int = 0,
              *, max_new_slices: int = 0, return_final: bool = False):
    """Multithreaded CPU finite-width SA over a replica batch.

    Args mirror :func:`sa_run` plus ``slices`` (``uint32[R, W]``, in/out),
    ``skip_lanes`` (``uint32[W]``), ``max_width``, the reslice cadence and
    the per-move rescue budget ``max_new_slices`` (reference
    greedy/optimizer.hpp:226-321).  Dense cost model.
    """
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, '_fw_bound'):
        lib.tnco_sa_run_fw.restype = ctypes.c_int64
        lib.tnco_sa_run_fw.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64
        ]
        lib._fw_bound = True
    nodes = np.ascontiguousarray(nodes, dtype=np.int32)
    inds = np.ascontiguousarray(inds, dtype=np.uint32)
    slices = np.ascontiguousarray(slices, dtype=np.uint32)
    r, n, w = inds.shape
    log2d = np.zeros(w * 32, dtype=np.float64)
    log2_dims = np.asarray(log2_dims, dtype=np.float64)
    log2d[:len(log2_dims)] = log2_dims
    skip = np.zeros(w, dtype=np.uint32)
    skip[:] = np.asarray(skip_lanes, dtype=np.uint32)
    betas = np.ascontiguousarray(betas, dtype=np.float64)
    seeds = np.ascontiguousarray(seeds, dtype=np.uint64)
    best = np.zeros(r, dtype=np.float64)
    if return_final:
        best_nodes = np.zeros_like(nodes)
        best_inds = np.zeros_like(inds)
        best_slices = np.zeros_like(slices)
        bn, bi, bs = (best_nodes.ctypes.data, best_inds.ctypes.data,
                      best_slices.ctypes.data)
    else:
        best_nodes = best_inds = best_slices = None
        bn = bi = bs = None
    moves = lib.tnco_sa_run_fw(
        nodes.ctypes.data, inds.ctypes.data, slices.ctypes.data, r, n, w,
        log2d.ctypes.data, len(log2_dims), skip.ctypes.data,
        float(max_width), betas.ctypes.data, len(betas),
        int(reslice_every), int(max_new_slices), seeds.ctypes.data,
        best.ctypes.data, bn, bi, bs, int(n_threads))
    if return_final:
        return (best, int(moves), nodes, inds, slices, best_nodes,
                best_inds, best_slices)
    return best, int(moves), nodes, inds, slices
