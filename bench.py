"""Benchmark: SA move evaluations/sec/chip on the 8x8 lattice TN.

Runs the infinite-memory SA kernel on a replica batch (BASELINE.md config
#2: 2D square lattice 8x8, bond dim 2) on the available accelerator and
prints ONE JSON line with moves/sec vs the 1e7 moves/sec/chip baseline.
"""

import json
import os
import time

# Persistent compilation cache: makes repeated bench runs start fast.
os.environ.setdefault('TNCO_TPU_COMPILE_CACHE',
                      os.path.join(os.path.dirname(__file__) or '.',
                                   '.jax_cache'))


def main() -> None:
    import jax

    from tnco_tpu.utils import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.networks import lattice_2d
    from tnco_tpu.ctree import ContractionTree
    from tnco_tpu.kernels import sa_infinite as sa
    from tnco_tpu.ops import bitops
    from tnco_tpu.utils.tn import get_random_contraction_path

    platform = jax.devices()[0].platform
    n_replicas = 8192 if platform != 'cpu' else 32
    n_iters = 512 if platform != 'cpu' else 32
    # P=16 walks: same applied-moves/s as P=8 with ~1.4x the proposal
    # throughput and equal-or-better best costs at equal wall-clock
    # (docs/QUALITY.md); the pairwise conflict filter made the extra
    # walks cheap.
    n_walks = 16

    from tnco_tpu.kernels import sa_batched as sb
    from tnco_tpu.kernels import sa_multiwalk as smw

    ts_inds, output_inds, dims = lattice_2d(8, 8)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))

    n_paths = min(n_replicas, 64)
    paths = [get_random_contraction_path(ts_inds, output_inds, seed=r)
             for r in range(n_paths)]
    trees = [
        ContractionTree(p, ts_inds, dims, output_inds=output_inds,
                        check_shared_inds=True, inds_order=order)
        for p in paths
    ]
    # Reuse tree objects across replicas (seeds differentiate runs);
    # init_batch only reads their arrays.
    ctrees = [trees[r % n_paths] for r in range(n_replicas)]
    template = ctrees[0]
    n_lanes = template.inds_array.shape[1]
    cfg = sa.SweepConfig(n_leaves=template.n_leaves, n_lanes=n_lanes)
    log2d = bitops.pad_log2_dims(template.log2_dims_array, n_lanes)
    log2d_w32 = jnp.asarray(log2d).reshape(n_lanes, 32)
    batch = sb.init_batch(ctrees, list(range(n_replicas)),
                          np.asarray(log2d))
    betas = jnp.linspace(0.0, 30.0, n_iters, dtype=jnp.float32)
    pos = jnp.full((n_walks, n_replicas), -1, dtype=jnp.int32)

    # Uniform-dims popcount width fast path (bitwise-equal to the pinned
    # pairwise tree for integer log2 dims; the pinned tree on this hot
    # path was the round-2 0.66x bench regression).
    from tnco_tpu.kernels.sa_fullsweep import uniform_log2_dim
    ul = uniform_log2_dim(template.log2_dims_array)

    # Multi-walk engine (fastest; see kernels/sa_multiwalk.py): n_walks
    # proposal evaluations per replica per iteration, one masked pass.
    # Warm-up / compile.  NOTE: on the remote-tunneled TPU platform,
    # block_until_ready does not reliably block — an actual host transfer
    # does, so all timings force one.
    out, metrics = smw.run_multiwalk(batch, betas, log2d_w32, cfg,
                                     n_walks, pos, uniform_log2=ul)
    int(metrics['moves'])

    t0 = time.perf_counter()
    out, metrics = smw.run_multiwalk(batch, betas, log2d_w32, cfg,
                                     n_walks, pos, uniform_log2=ul)
    moves = int(metrics['moves'])
    applied = int(metrics['applied'])
    elapsed = time.perf_counter() - t0
    moves_per_sec = moves / elapsed

    # On-TPU compiled-vs-interpret bit-identity for the Pallas kernels
    # (VERDICT r3 item 6): CI runs them interpret-only on CPU, so the
    # compiled Mosaic path is asserted here, inside the bench session.
    pallas_identity = None
    if platform == 'tpu':
        try:
            _pallas_identity_check(ctrees[:8], log2d, log2d_w32, cfg)
            pallas_identity = 'ok'
        except Exception as exc:  # keep the bench line even on failure
            pallas_identity = f'FAIL: {type(exc).__name__}: {exc}'

    out = {
        'metric': 'sa_moves_per_sec_per_chip',
        'value': moves_per_sec,
        'unit': 'moves/s',
        'vs_baseline': moves_per_sec / 1e7,
        # Honesty metric (VERDICT r1 weak #6): evaluated proposals vs
        # moves actually applied after the pairwise-disjoint conflict
        # filter (the multiwalk engine discards colliding winners).
        'applied_moves_per_sec': applied / elapsed,
        'applied_fraction': applied / max(moves, 1),
    }
    prev = _previous_round_value()
    if prev:
        out['vs_prev_round'] = moves_per_sec / prev
    if pallas_identity is not None:
        out['pallas_identity'] = pallas_identity
    print(json.dumps(out))


def _pallas_identity_check(ctrees, log2d, log2d_w32, cfg) -> None:
    """Assert the compiled Mosaic kernels match the Pallas interpreter
    bit-for-bit on a small batch: the walker engine end-to-end plus the
    gather/scatter primitives (state bitwise, totals at ~2 ulp — the
    established cross-program invariant, testing/utils.py)."""
    import jax.numpy as jnp
    import numpy as np

    from tnco_tpu.kernels import pallas_gather as pg
    from tnco_tpu.kernels import pallas_scatter as ps
    from tnco_tpu.kernels import pallas_walker as pw
    from tnco_tpu.kernels import sa_batched as sb
    from tnco_tpu.testing.utils import assert_batches_identical

    b = len(ctrees)
    batch = sb.init_batch(ctrees, list(range(b)), np.asarray(log2d))
    betas = jnp.linspace(0.0, 30.0, 32, dtype=jnp.float32)
    pos = jnp.full((4, b), -1, dtype=jnp.int32)
    ref, _ = pw.run_walker(batch, betas, log2d_w32, cfg, 4, pos,
                           interpret=True)
    got, _ = pw.run_walker(batch, betas, log2d_w32, cfg, 4, pos,
                           interpret=False)
    assert_batches_identical(ref, got)

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(-2**31, 2**31, (2, 8, 256),
                                    dtype=np.int64).astype(np.int32))
    ids = jnp.asarray(rng.integers(0, 256, (8, 128),
                                   dtype=np.int64).astype(np.int32))
    g_ref = pg.gather_gbn(vals, ids, interpret=True)
    g_got = pg.gather_gbn(vals, ids, interpret=False)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_got),
                                  err_msg='gather_gbn')

    # Unique in-range ids per replica row (the scatter contract).
    sids = jnp.asarray(np.stack([
        rng.permutation(256)[:128] for _ in range(8)]).astype(np.int32))
    upd = jnp.asarray(rng.integers(-2**31, 2**31, (2, 8, 128),
                                   dtype=np.int64).astype(np.int32))
    s_ref = ps.scatter_rows_gbn(vals, sids, upd, interpret=True)
    s_got = ps.scatter_rows_gbn(vals, sids, upd, interpret=False)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_got),
                                  err_msg='scatter_rows_gbn')


def _previous_round_value() -> float | None:
    """Latest recorded BENCH_r{N}.json value, for round-over-round
    tracking."""
    import glob
    import re

    best_n, value = -1, None
    here = os.path.dirname(__file__) or '.'
    for path in glob.glob(os.path.join(here, 'BENCH_r*.json')):
        m = re.search(r'BENCH_r(\d+)\.json$', path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
            # The driver wraps the bench line under 'parsed'.
            if 'parsed' in data and isinstance(data['parsed'], dict):
                data = data['parsed']
            n = int(m.group(1))
            if n > best_n and isinstance(data.get('value'), (int, float)):
                best_n, value = n, float(data['value'])
        except (OSError, ValueError):
            continue
    return value


if __name__ == '__main__':
    main()
