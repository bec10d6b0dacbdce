"""Row-major Pallas walker engine == masked multi-walk engine, bitwise.

Runs the walker in interpreter mode on CPU (the conftest forces the CPU
platform); on-chip exactness is exercised by the benchmark drivers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax
from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import pallas_walker as pw
from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_multiwalk as smw
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import (assert_batches_identical,
                                    generate_random_tensors)
from tnco_tpu.utils.tn import get_random_contraction_path


def _setup(rng, random_seed, n_replicas):
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, min_n_tensors=8, max_n_tensors=14, n_output_inds=1)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    trees = []
    for r in range(n_replicas):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        trees.append(
            ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order))
    return trees


@pytest.mark.parametrize('n_walks', [4, 8])
def test_walker_bit_identical(n_walks, rng, random_seed):
    trees = _setup(rng, random_seed, n_replicas=3)
    template = trees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(trees, [0, 1, 2], np.asarray(log2d))
    pos = jnp.full((n_walks, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 10.0, 30, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, n_walks,
                                  pos)
    got, mgot = pw.run_walker(batch, betas, log2d_w32, cfg, n_walks,
                              pos, interpret=True)
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_walker_continuation(rng, random_seed):
    """Two chained walker calls == one masked run of the same length."""
    trees = _setup(rng, random_seed, n_replicas=2)
    template = trees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(trees, [5, 6], np.asarray(log2d))
    p = 4
    pos = jnp.full((p, 2), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 6.0, 20, dtype=jnp.float32)

    ref, mref = smw.run_multiwalk(batch, betas, log2d_w32, cfg, p, pos)

    mid, m1 = pw.run_walker(batch, betas[:10], log2d_w32, cfg, p, pos,
                            interpret=True)
    got, m2 = pw.run_walker(mid, betas[10:], log2d_w32, cfg, p,
                            m1['pos'], interpret=True)
    assert int(mref['moves']) == int(m1['moves']) + int(m2['moves'])
    assert_batches_identical(ref, got)


def test_walker_fw_bit_identical(rng, random_seed):
    """FW walker (kernel segments + XLA reslices) == masked FW engine."""
    from tnco_tpu.kernels import sa_finite_batched as sfb
    from tnco_tpu.kernels.sa_finite import SweepConfigFW

    trees = _setup(rng, random_seed, n_replicas=3)
    template = trees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    max_width = 3.0
    batch = sfb.init_batch_fw(trees, [0, 1, 2], max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    p = 4
    pos = jnp.full((p, 3), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 8.0, 25, dtype=jnp.float32)
    upd = np.arange(25) % 10 == 0

    ref, mref = smw.run_multiwalk_fw(batch, betas, jnp.asarray(upd),
                                     max_width, log2d_w32, skip, cfg, p,
                                     pos)
    got, mgot = pw.run_walker_fw(batch, betas, upd, max_width,
                                 log2d_w32, skip, cfg, p, pos,
                                 interpret=True)
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_walker_sharded_bit_identical(rng, random_seed):
    """shard_map execution over the virtual mesh reproduces the
    single-device walker trajectories bit for bit (replicas are
    independent; VERDICT r3 item 2 — the IM flagship engine needs a
    pod path)."""
    from tnco_tpu.parallel.replicas import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 devices')
    mesh = make_mesh(jax.devices()[:4])
    trees = _setup(rng, random_seed, n_replicas=8)
    template = trees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(trees, list(range(8)), np.asarray(log2d))
    pos = jnp.full((3, 8), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 8.0, 20, dtype=jnp.float32)

    ref, mref = pw.run_walker(batch, betas, log2d_w32, cfg, 3, pos,
                              interpret=True)
    got, mgot = pw.run_walker_sharded(batch, betas, log2d_w32, cfg, 3,
                                      pos, mesh, interpret=True)
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_walker_fw_sharded_bit_identical(rng, random_seed):
    """FW sharded walker (segments + reslices inside shard_map) ==
    the single-device FW walker, bitwise."""
    from tnco_tpu.kernels import sa_finite_batched as sfb
    from tnco_tpu.kernels.sa_finite import SweepConfigFW
    from tnco_tpu.parallel.replicas import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip('needs >= 4 devices')
    mesh = make_mesh(jax.devices()[:4])
    trees = _setup(rng, random_seed, n_replicas=8)
    template = trees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)
    max_width = 3.0
    batch = sfb.init_batch_fw(trees, list(range(8)), max_width,
                              np.asarray(log2d),
                              skip_lanes=np.asarray(skip))
    p = 4
    pos = jnp.full((p, 8), -1, dtype=jnp.int32)
    betas = jnp.linspace(0.0, 8.0, 20, dtype=jnp.float32)
    upd = np.arange(20) % 10 == 0

    ref, mref = pw.run_walker_fw(batch, betas, upd, max_width,
                                 log2d_w32, skip, cfg, p, pos,
                                 interpret=True)
    got, mgot = pw.run_walker_sharded(batch, betas, log2d_w32, cfg, p,
                                      pos, mesh, interpret=True,
                                      fw_args=(upd, max_width, skip))
    assert int(mref['moves']) == int(mgot['moves'])
    assert int(mref['applied']) == int(mgot['applied'])
    np.testing.assert_array_equal(np.asarray(mref['pos']),
                                  np.asarray(mgot['pos']))
    assert_batches_identical(ref, got)


def test_walker_rows_roundtrip_fuzz(rng, random_seed):
    """_pack_rows/_unpack_rows exactness incl. the FW width lane and
    slices row at stressed value ranges."""
    nprng = np.random.default_rng(random_seed)
    n = int(nprng.integers(3, 1500))
    if n % 2 == 0:
        n += 1  # contraction trees have odd node counts
    b = int(nprng.integers(1, 4))
    w = int(nprng.integers(1, 8))
    n_leaves = (n + 1) // 2
    n_pad = pw._n_pad(n, n_leaves)
    c0 = jnp.asarray(
        nprng.integers(-1, n, (n, b), dtype=np.int64), jnp.int32)
    c1 = jnp.asarray(
        nprng.integers(-1, n, (n, b), dtype=np.int64), jnp.int32)
    par = jnp.asarray(
        nprng.integers(-1, n, (n, b), dtype=np.int64), jnp.int32)
    lcc = jnp.asarray(np.exp2(nprng.uniform(-126, 127, (n, b))),
                      jnp.float32)
    inds = jnp.asarray(
        nprng.integers(0, 2**32, (n, w, b), dtype=np.uint64), jnp.uint32)
    width = jnp.asarray(np.exp2(nprng.uniform(-20, 100, (n, b))),
                        jnp.float32)
    slices = jnp.asarray(
        nprng.integers(0, 2**32, (w, b), dtype=np.uint64), jnp.uint32)

    rows = pw._pack_rows(c0, c1, par, lcc, inds, n_pad)
    outs = pw._unpack_rows(rows, n, w)
    for a, bb in zip((c0, c1, par, lcc, inds), outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    rows_fw = pw._pack_rows(c0, c1, par, lcc, inds, n_pad, width=width,
                            slices=slices)
    outs_fw = pw._unpack_rows(rows_fw, n, w, fw=True)
    for a, bb in zip((c0, c1, par, lcc, inds, width, slices), outs_fw):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
