"""Lane-major finite-width engine must match the vmapped FW kernel
bit-for-bit (same PRNG streams, same trees/slices/costs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.kernels import sa_finite as saf
from tnco_tpu.kernels import sa_finite_batched as sfb
from tnco_tpu.ops import bitops
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


@pytest.mark.parametrize('max_width', [2.5, 4.0])
def test_fw_batched_matches_vmapped(max_width, rng, random_seed):
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    states, template = [], None
    for r in range(4):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctree = ContractionTree(path, ts_inds, dims,
                                output_inds=output_inds,
                                check_shared_inds=True, inds_order=order)
        template = template or ctree
        log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                     ctree.inds_array.shape[1])
        states.append(saf.init_state_fw(ctree, random_seed + r, max_width,
                                        log2d))
    n_lanes = template.inds_array.shape[1]
    cfg = saf.SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)

    betas = jnp.linspace(0.0, 15.0, 30, dtype=jnp.float32)
    mask = jnp.asarray((np.arange(30) % 5) == 0)

    vstack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    vout, vmet = saf.run_sweeps_fw_batch(vstack, betas, mask,
                                         jnp.float32(max_width), log2d,
                                         skip, cfg)

    batch = sfb.from_states_fw(states)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    bout, bmet = sfb.run_sweeps_fw_batched(batch, betas, mask,
                                           jnp.float32(max_width),
                                           log2d_w32, skip, cfg)

    np.testing.assert_array_equal(np.asarray(vout.nodes[:, :, 0]),
                                  np.asarray(bout.c0).T)
    np.testing.assert_array_equal(
        np.asarray(vout.inds), np.moveaxis(np.asarray(bout.inds), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(vout.slices),
        np.moveaxis(np.asarray(bout.slices), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(vout.min_slices),
        np.moveaxis(np.asarray(bout.min_slices), -1, 0))
    np.testing.assert_allclose(np.asarray(vout.min_log2_total),
                               np.asarray(bout.min_log2_total), rtol=1e-6)
    assert int(np.sum(vmet['moves'])) == int(np.sum(bmet['moves']))

    s0 = sfb.replica_state_fw(bout, 0)
    np.testing.assert_array_equal(np.asarray(s0.width),
                                  np.asarray(vout.width[0]))


def test_fw_batched_rescue_matches_vmapped(rng, random_seed):
    """max_new_slices > 0 (rescue branch) stays bit-identical."""
    max_width = 2.0
    ts_inds, output_inds, dims = generate_random_tensors(rng,
                                                         n_output_inds=2)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    states, template = [], None
    for r in range(3):
        paths = get_random_contraction_path(ts_inds, output_inds,
                                            merge_paths=False,
                                            seed=random_seed + r)
        (path,) = [p for p in paths if p]
        ctree = ContractionTree(path, ts_inds, dims,
                                output_inds=output_inds,
                                check_shared_inds=True, inds_order=order)
        template = template or ctree
        log2d = bitops.pad_log2_dims(ctree.log2_dims_array,
                                     ctree.inds_array.shape[1])
        states.append(saf.init_state_fw(ctree, random_seed + r, max_width,
                                        log2d))
    n_lanes = template.inds_array.shape[1]
    cfg = saf.SweepConfigFW(n_leaves=template.n_leaves, n_lanes=n_lanes,
                            max_new_slices=2)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    skip = jnp.zeros(n_lanes, dtype=jnp.uint32)

    betas = jnp.linspace(0.0, 10.0, 20, dtype=jnp.float32)
    mask = jnp.asarray((np.arange(20) % 7) == 0)

    vstack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    vout, vmet = saf.run_sweeps_fw_batch(vstack, betas, mask,
                                         jnp.float32(max_width), log2d,
                                         skip, cfg)

    batch = sfb.from_states_fw(states)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    bout, bmet = sfb.run_sweeps_fw_batched(batch, betas, mask,
                                           jnp.float32(max_width),
                                           log2d_w32, skip, cfg)

    np.testing.assert_array_equal(np.asarray(vout.nodes[:, :, 0]),
                                  np.asarray(bout.c0).T)
    np.testing.assert_array_equal(
        np.asarray(vout.inds), np.moveaxis(np.asarray(bout.inds), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(vout.slices),
        np.moveaxis(np.asarray(bout.slices), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(vout.min_slices),
        np.moveaxis(np.asarray(bout.min_slices), -1, 0))
    np.testing.assert_allclose(np.asarray(vout.min_log2_total),
                               np.asarray(bout.min_log2_total), rtol=1e-6)
    assert int(np.sum(vmet['moves'])) == int(np.sum(bmet['moves']))


@pytest.mark.parametrize('ul,skip_all', [(1.0, False), (2.0, False),
                                         (1.0, True)])
def test_greedy_slices_fast_matches_reference_path(ul, skip_all,
                                                   random_seed):
    """The sorted-space slicer (uniform power-of-two dims) must produce
    EXACTLY the slice lanes of the reference per-node-round path."""
    nprng = np.random.default_rng(random_seed)
    n, b = 37, 5
    n_inds = 45  # not a lane multiple on purpose
    w = -(-n_inds // 32)
    inds_np = nprng.integers(0, 2**32, size=(n, w, b),
                             dtype=np.uint64).astype(np.uint32)
    mask_words = np.zeros(w, np.uint32)
    for i in range(n_inds):
        mask_words[i // 32] |= np.uint32(1) << np.uint32(i % 32)
    inds_np &= mask_words[None, :, None]  # clear pad bits
    inds_np[:4] = 0                       # a few empty (leaf-like) rows
    inds = jnp.asarray(inds_np)

    valid = (np.arange(w * 32) < n_inds)
    log2d_w32 = jnp.asarray(
        np.where(valid, ul, 0.0).astype(np.float32)).reshape(w, 32)

    pc = np.zeros((n, b), np.int64)       # exact popcount widths
    for wi in range(w):
        v = inds_np[:, wi, :].copy()
        for _ in range(32):
            pc += (v & 1)
            v >>= 1
    width = jnp.asarray(pc.astype(np.float32) * np.float32(ul))
    max_width = float(np.median(pc) * ul)  # plenty of over-width nodes

    if skip_all:
        skip = jnp.asarray(mask_words)     # nothing sliceable
    else:
        skip_np = nprng.integers(0, 2**32, size=w,
                                 dtype=np.uint64).astype(np.uint32)
        skip = jnp.asarray(skip_np & mask_words)

    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(random_seed, random_seed + b, dtype=jnp.uint32))

    ref = sfb._greedy_slices_b(None, inds, width, keys,
                               jnp.float32(max_width), log2d_w32,
                               skip[:, None], None, None,
                               uniform_log2=None)
    fast = sfb._greedy_slices_b(None, inds, width, keys,
                                jnp.float32(max_width), log2d_w32,
                                skip[:, None], None, None,
                                uniform_log2=ul)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))

    # multi-window exercise (window smaller than the over-node count)
    small = sfb._greedy_slices_fast(inds, width, keys,
                                    jnp.float32(max_width), log2d_w32,
                                    skip[:, None], ul, window=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(small))
