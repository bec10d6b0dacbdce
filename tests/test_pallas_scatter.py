"""pallas_scatter: interpret-mode kernels == XLA lowering == oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tnco_tpu.kernels import pallas_scatter as ps


def _unique_ids(r, b, n, q):
    """Per-row unique in-range ids mixed with NULLs, shuffled."""
    ids = np.full((b, q), -1, np.int32)
    for i in range(b):
        k = int(r.integers(0, min(q, n) + 1))
        ids[i, :k] = r.choice(n, size=k, replace=False)
        r.shuffle(ids[i])
    return ids


def _oracle(vals, ids, upd):
    want = vals.copy()
    b, q = ids.shape
    for i in range(b):
        for j in range(q):
            if ids[i, j] >= 0:
                want[:, i, ids[i, j]] = upd[:, i, j]
    return want


@pytest.mark.parametrize('dtype', ['int32', 'uint32', 'float32'])
def test_scatter_matches_oracle(random_seed, dtype):
    r = np.random.default_rng(random_seed)
    g, b = int(r.integers(1, 4)), int(r.integers(3, 20))
    n, q = int(r.integers(5, 400)), int(r.integers(1, 300))
    if dtype == 'float32':
        vals = r.standard_normal((g, b, n)).astype(np.float32)
        upd = r.standard_normal((g, b, q)).astype(np.float32)
    else:
        vals = r.integers(0, 2**31, (g, b, n)).astype(dtype)
        upd = r.integers(0, 2**31, (g, b, q)).astype(dtype)
    ids = _unique_ids(r, b, n, q)
    want = _oracle(vals, ids, upd)

    got = ps.scatter_rows_gbn(jnp.asarray(vals), jnp.asarray(ids),
                              jnp.asarray(upd), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
    # default off-TPU path (XLA lowering)
    auto = ps.scatter_rows_gbn(jnp.asarray(vals), jnp.asarray(ids),
                               jnp.asarray(upd))
    np.testing.assert_array_equal(np.asarray(auto), want)


def test_inv_ids_matches_xla(random_seed):
    r = np.random.default_rng(random_seed + 1)
    b, n, q = 9, 260, 140
    ids = _unique_ids(r, b, n, q)
    inv_pl = np.asarray(ps.inv_ids(jnp.asarray(ids), n, interpret=True))
    inv_xla = np.asarray(ps.inv_ids(jnp.asarray(ids), n))
    np.testing.assert_array_equal(inv_pl, inv_xla)
    # Round trip: inv maps every in-range id back to its q.
    for i in range(b):
        for j in range(q):
            if ids[i, j] >= 0:
                assert inv_pl[i, ids[i, j]] == j
    # Cells with no id map to NULL.
    covered = set()
    for i in range(b):
        for j in range(q):
            if ids[i, j] >= 0:
                covered.add((i, ids[i, j]))
    for i in range(b):
        for nn in range(n):
            if (i, nn) not in covered:
                assert inv_pl[i, nn] == -1


def test_scatter_null_only_is_identity(random_seed):
    r = np.random.default_rng(random_seed + 2)
    vals = r.integers(0, 2**31, (2, 5, 50)).astype(np.int32)
    ids = np.full((5, 8), -1, np.int32)
    upd = r.integers(0, 2**31, (2, 5, 8)).astype(np.int32)
    got = ps.scatter_rows_gbn(jnp.asarray(vals), jnp.asarray(ids),
                              jnp.asarray(upd), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), vals)


@pytest.mark.parametrize('dtype', ['int32', 'uint32'])
def test_scatter_inplace_matches_oracle(random_seed, dtype):
    """scatter_rows_inplace == oracle applied to only the plane range,
    with all other planes untouched (XLA fallback path off-TPU; the
    donated-buffer Mosaic path runs on real TPUs)."""
    r = np.random.default_rng(random_seed + 3)
    g, b = int(r.integers(3, 8)), int(r.integers(3, 20))
    n, q = int(r.integers(5, 400)), int(r.integers(1, 300))
    lo = int(r.integers(0, g))
    hi = int(r.integers(lo + 1, g + 1))
    vals = r.integers(0, 2**31, (g, b, n)).astype(dtype)
    upd = r.integers(0, 2**31, (hi - lo, b, q)).astype(dtype)
    ids = _unique_ids(r, b, n, q)
    want = vals.copy()
    want[lo:hi] = _oracle(vals[lo:hi], ids, upd)
    got = ps.scatter_rows_inplace(jnp.asarray(vals), jnp.asarray(ids),
                                  jnp.asarray(upd), planes=(lo, hi))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_scatter_inplace_kernel_interpret(random_seed):
    """The Mosaic in-place kernel logic (interpret mode) at pre-padded
    shapes with the FULL plane range (every output block written — the
    unwritten-plane carry-through relies on the real donated buffer and
    is exercised on TPU by the engine suites)."""
    r = np.random.default_rng(random_seed + 4)
    g, b, n, q = 6, 8, 256, 96
    vals = r.integers(0, 2**31, (g, b, n)).astype(np.int32)
    upd = r.integers(0, 2**31, (g, b, q)).astype(np.int32)
    ids = _unique_ids(r, b, n, q)
    want = _oracle(vals, ids, upd)
    got = ps.scatter_rows_inplace(jnp.asarray(vals), jnp.asarray(ids),
                                  jnp.asarray(upd), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
