"""Row-major Pallas multi-walk engine: VMEM-resident state, O(1) rows.

The masked engines pay O(N) per row access ([P,N,W,B] broadcasts) and
the MXU engine pays O(N) in one-hot GEMM traffic; both are why
Sycamore-scale throughput sits ~100x below the small-network headline.
This engine makes a row access O(1): each replica's state lives in VMEM
as ``[N_pad, 128]`` int32 ROWS (lanes = [c0, c1, par, lcc, inds[0..W)],
zero-padded to 128 lanes) and a node lookup is a dynamic-SUBLANE slice
``ref[pl.ds(id, 1), :]`` — the cheap direction on TPU.  One replica per
grid step; P walks are gathered row by row in a ``fori_loop``, then all
proposal math runs vectorized as ``[P, 128]`` VPU tiles.

Semantics are IDENTICAL to :func:`tnco_tpu.kernels.sa_multiwalk
.run_multiwalk` (same proposal geometry, accept rule, priority conflict
filter, additive float updates) and the random draws are precomputed
OUTSIDE the kernel with the same threefry streams, so trajectories are
bit-identical to the masked/MXU engines (exact in interpret mode;
on-chip exactness additionally requires Mosaic's exp2/log2 to round
like XLA's — checked by tests at small scale).  Width and log2-total
reductions replicate the order-pinned pairwise trees of
``bitops.pairwise_sum_last`` / ``costs.pairwise_sum`` exactly (w-major
halving then bit halving, zero padding, pow2(N_int) total-tree size).

Mosaic constraints honoured (docs/ROADMAP.md findings): fori-only
control flow, no uint any() (i8->i1 truncation), no lane-dynamic
indexing (transposes instead).

Reference semantics: include/tnco/optimize/infinite_memory/
optimizer.hpp:90-221, as for all engines.
"""

import functools as fts

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnco_tpu.kernels.sa_batched import (SABatch, _log2_total_b,
                                         compute_hyper_b)
from tnco_tpu.kernels.sa_infinite import SweepConfig
from tnco_tpu.kernels.sa_multiwalk import NULL, _draws

__all__ = ['run_walker', 'walker_supported']

_LANES = 128
_C0, _C1, _PAR, _LCC, _INDS = 0, 1, 2, 3, 4
_SCALED_FLOOR = np.float32(2.0**-60)
_NEG_INF = np.float32(-np.inf)
_WIDTH_EPS = np.float32(1e-4)  # must equal sa_finite._WIDTH_EPS
_WPRE, _INDS_FW = 4, 5


def _pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def walker_supported(n: int, n_leaves: int, w: int) -> bool:
    return w + _INDS <= _LANES and n - n_leaves > 0 and n < 30000


def _n_pad(n: int, n_leaves: int) -> int:
    """Row padding: the internal slice must be exactly pow2(N_int) long
    (the pinned log2-total pairing must match ``costs.pairwise_sum``'s
    zero-padded tree) and the block row count must be 8-aligned for the
    Mosaic tiling rules."""
    return -(-(n_leaves + _pow2(n - n_leaves)) // 8) * 8


def _make_kernel(cfg: SweepConfig, n: int, w: int, p: int, k_iters: int,
                 fw: bool = False, max_width: float = 0.0,
                 defer_last_min: bool = False):
    n_leaves = cfg.n_leaves
    n_int_pad = _pow2(n - n_leaves)
    pp = _LANES  # walk sublanes padded to the vector width
    wp = _pow2(w)
    io = _INDS_FW if fw else _INDS  # first inds lane
    n_slices = _n_pad(n, n_leaves)  # slices row index (FW layout)
    mw = np.float32(max_width)

    n_rows = _n_pad(n, n_leaves) + (8 if fw else 0)

    def kernel(log2d_ref, betas_ref, leaf_ref, bit_ref, u_ref,
               state_hbm, min_hbm, pos_in, minlt_in,
               state_out_hbm, min_out_hbm, pos_ref, minlt_ref, stats_ref,
               state_ref, rows_b, rows_a, rows_0, rows_1, rows_c,
               rows_nb, rows_na, ids_ref, fv_ref, krow_ref, dma_sem):
        # State and min stay in HBM (a VMEM-blocked pipeline of the
        # [N_pad, 128] state quadruple exceeds the 16MB scoped budget at
        # Sycamore scale); one replica's state is DMA'd into a single
        # VMEM scratch for the whole K-iteration chunk.
        block = pl.program_id(0)
        row0 = block * n_rows

        dma = pltpu.make_async_copy(
            state_hbm.at[pl.ds(row0, n_rows), :], state_ref, dma_sem)
        dma.start()
        dma.wait()
        # min_out starts as min_in (overwritten on improvement below)
        dma = pltpu.make_async_copy(
            min_hbm.at[pl.ds(row0, n_rows), :],
            min_out_hbm.at[pl.ds(row0, n_rows), :], dma_sem)
        dma.start()
        dma.wait()
        pos_ref[:] = pos_in[:]
        minlt_ref[:] = minlt_in[:]
        stats_ref[:] = jnp.zeros((8, _LANES), jnp.int32)

        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        iota_pcol = jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0)
        valid_col = iota_pcol < p
        zero_row = jnp.zeros((1, _LANES), jnp.int32)
        inds_mask = (iota_lane >= io) & (iota_lane < io + w)

        def u32(x):
            return jax.lax.bitcast_convert_type(x, jnp.uint32)

        def i32(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def f32(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        def row_of(idx):
            """State row; zeros for NULL (matches a NULL one-hot)."""
            r = state_ref[pl.ds(jnp.maximum(idx, 0), 1), :]
            return jnp.where(idx < 0, zero_row, r)

        def any_bits(x_u32):
            """[P,128] uint32, inds lanes only -> [P,1] bool."""
            nz = jnp.where(inds_mask & (i32(x_u32) != 0), 1, 0)
            return jnp.sum(nz, axis=1, keepdims=True) > 0

        def width_pinned(rows_u32):
            """[P,128] rows -> [P,1] f32 width; exact pinned pairing
            (w-major lane halving per bit, then bit halving)."""
            per_s = []
            for s in range(32):
                bits = i32((rows_u32 >> jnp.uint32(s)) &
                           jnp.uint32(1)).astype(jnp.float32)
                t = (bits * log2d_ref[pl.ds(s, 1), :])[:, io:io + w]
                if wp != w:
                    t = jnp.concatenate(
                        [t, jnp.zeros((t.shape[0], wp - w), jnp.float32)],
                        axis=1)
                while t.shape[1] > 1:
                    h = t.shape[1] // 2
                    t = t[:, :h] + t[:, h:]
                per_s.append(t)
            while len(per_s) > 1:
                h = len(per_s) // 2
                per_s = [per_s[i] + per_s[i + h] for i in range(h)]
            return per_s[0]

        def log2_total():
            lcc_col = f32(
                state_ref[pl.ds(n_leaves, n_int_pad), _LCC:_LCC + 1])
            m = jnp.max(lcc_col, axis=0, keepdims=True)
            t = jnp.exp2(lcc_col - m)
            while t.shape[0] > 1:
                h = t.shape[0] // 2
                t = t[:h] + t[h:]
            return (m + jnp.log2(t))[0, 0]

        def set_lane(base, lane, col_i32):
            return jnp.where(iota_lane == lane, col_i32, base)

        def step(it, _):
            lt = log2_total()

            # ---- Per-walk gathers ------------------------------------
            # Python-unrolled: Mosaic accepts dynamic-sublane ROW slices
            # keyed by traced scalars (pl.ds(id, 1)) but crashes on
            # scalar reads at loop-carried positions, so every scalar
            # read below sits at a STATIC position and only the row
            # index is traced.
            leaf_row = leaf_ref[pl.ds(it, 1), :]
            bit_row = bit_ref[pl.ds(it, 1), :]
            u_row = u_ref[pl.ds(it, 1), :]
            for i in range(p):
                pos_i = pos_ref[i, 0]
                row_pos = state_ref[pl.ds(jnp.maximum(pos_i, 0), 1), :]
                par_pos = jnp.where(pos_i < 0, NULL, row_pos[0, _PAR])
                leaf_i = leaf_row[0, i]
                new_pos = state_ref[pl.ds(leaf_i, 1), :][0, _PAR]
                boundary = (pos_i == NULL) | (par_pos == NULL)
                b_i = jnp.where(boundary, new_pos, pos_i)
                rows_b[pl.ds(i, 1), :] = row_of(b_i)
                a_i = rows_b[i, _PAR]
                rows_a[pl.ds(i, 1), :] = row_of(a_i)
                rows_0[pl.ds(i, 1), :] = row_of(rows_b[i, _C0])
                rows_1[pl.ds(i, 1), :] = row_of(rows_b[i, _C1])
                c0a = rows_a[i, _C0]
                c_i = jnp.where(c0a == b_i, rows_a[i, _C1], c0a)
                rows_c[pl.ds(i, 1), :] = row_of(c_i)
                ids_ref[i:i + 1, 0:1] = jnp.full((1, 1), b_i,
                                                 jnp.int32)
                ids_ref[i:i + 1, 1:2] = jnp.full((1, 1), a_i,
                                                 jnp.int32)
                ids_ref[i:i + 1, 2:3] = jnp.full((1, 1), c_i,
                                                 jnp.int32)
                ids_ref[i:i + 1, 5:6] = jnp.full((1, 1), bit_row[0, i],
                                                 jnp.int32)
                fv_ref[i:i + 1, 0:1] = jnp.full((1, 1), u_row[0, i],
                                                jnp.float32)

            # ---- Vector phase ----------------------------------------
            rb, ra = rows_b[:], rows_a[:]
            r0, r1, rc = rows_0[:], rows_1[:], rows_c[:]
            ids = ids_ref[:]
            b_col = ids[:, 0:1]
            a_col = ids[:, 1:2]
            c_col = ids[:, 2:3]
            c0b_col = rb[:, _C0:_C0 + 1]
            c1b_col = rb[:, _C1:_C1 + 1]

            i0 = any_bits(u32(r0) & u32(rc))
            i1 = any_bits(u32(r1) & u32(rc))
            both = i0 & i1
            rand_b = ids[:, 5:6] > 0
            u_col = fv_ref[:, 0:1]
            pick_rand = both if not cfg.disable_shared_inds else \
                jnp.ones_like(both)
            take0 = (pick_rand & rand_b) | (~pick_rand & i0)
            d_col = jnp.where(take0, c0b_col, c1b_col)
            e_col = jnp.where(take0, c1b_col, c0b_col)
            t0m = take0  # [P,1] broadcasts over lanes
            inds_d = jnp.where(t0m, u32(r0), u32(r1))
            inds_e = jnp.where(t0m, u32(r1), u32(r0))
            hyp_a = u32(ra) & u32(rb) & u32(rc)
            hyp_b = u32(rb) & u32(r0) & u32(r1)
            new_inds_b = ((inds_d ^ u32(rc)) | hyp_a | hyp_b) & \
                jnp.where(inds_mask, jnp.uint32(0xFFFFFFFF),
                          jnp.uint32(0))

            l_a = f32(ra[:, _LCC:_LCC + 1])
            l_b = f32(rb[:, _LCC:_LCC + 1])
            if fw:
                sl_row = u32(state_ref[pl.ds(n_slices, 1), :])
                new_width_b = width_pinned(new_inds_b)
                new_sliced_width_b = width_pinned(new_inds_b & ~sl_row)
                fits = new_sliced_width_b <= mw + _WIDTH_EPS
                ln_b = width_pinned((inds_d | u32(rc)) | sl_row)
                ln_a = width_pinned((new_inds_b | inds_e) | sl_row)
            else:
                ln_b = width_pinned(inds_d | u32(rc))
                ln_a = width_pinned(new_inds_b | inds_e)

            m = jnp.maximum(lt, jnp.maximum(ln_a, ln_b))
            s = (jnp.exp2(lt - m) - jnp.exp2(l_a - m) -
                 jnp.exp2(l_b - m) + jnp.exp2(ln_a - m) +
                 jnp.exp2(ln_b - m))
            l_new = m + jnp.log2(jnp.maximum(s, _SCALED_FLOOR))

            beta = betas_ref[pl.ds(it, 1), :][0, 0]
            if cfg.prob_kind == 'mh':
                acc = jnp.log2(u_col) <= -beta * (l_new - lt)
            elif cfg.prob_kind == 'greedy':
                acc = l_new <= lt
            else:
                acc = jnp.ones_like(l_new, dtype=bool)
            accept = acc & (b_col != NULL) & (a_col != NULL) & valid_col
            if fw:
                accept = accept & fits


            # New B and A rows, fully vectorized.
            v_b = rb
            v_b = set_lane(v_b, _C0,
                           jnp.where(c0b_col == e_col, c_col, c0b_col))
            v_b = set_lane(v_b, _C1,
                           jnp.where(c1b_col == e_col, c_col, c1b_col))
            v_b = set_lane(v_b, _PAR, a_col)
            v_b = set_lane(v_b, _LCC, i32(l_b + (ln_b - l_b)))
            if fw:
                w_b = f32(rb[:, _WPRE:_WPRE + 1])
                v_b = set_lane(v_b, _WPRE,
                               i32(w_b + (new_width_b - w_b)))
            v_b = jnp.where(inds_mask, i32(new_inds_b), v_b)
            c0a_col = ra[:, _C0:_C0 + 1]
            c1a_col = ra[:, _C1:_C1 + 1]
            v_a = ra
            v_a = set_lane(v_a, _C0,
                           jnp.where(c0a_col == c_col, e_col, c0a_col))
            v_a = set_lane(v_a, _C1,
                           jnp.where(c1a_col == c_col, e_col, c1a_col))
            v_a = set_lane(v_a, _LCC, i32(l_a + (ln_a - l_a)))
            rows_nb[:] = v_b
            rows_na[:] = v_a
            ids_ref[:, 3:4] = d_col
            ids_ref[:, 4:5] = e_col
            ids_ref[:, 6:7] = jnp.where(accept, 1, 0)

            # ---- Priority conflict filter ----------------------------
            # conf[p, q] = walks p and q share any of their 5 nodes
            # (symmetric: built from all 5x5 ordered id pairs).  The
            # sequential priority scan mirrors _claim_disjoint exactly:
            # lower walk index wins; only KEPT walks block.
            id_cols = (b_col, a_col, c_col, d_col, e_col)
            conf = jnp.zeros((pp, pp), jnp.int32)
            for x in id_cols:
                for y in id_cols:
                    conf = conf | jnp.where(x == y.reshape(1, pp), 1, 0)

            iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, pp), 1)

            keep_row = jnp.zeros((1, pp), jnp.int32)
            for pi in range(p):
                conf_p = conf[pi:pi + 1, :]
                blocked = jnp.sum(
                    jnp.where((keep_row > 0) & (conf_p > 0) &
                              (iota_row < pi), 1, 0)) > 0
                acc_p = ids_ref[pi, 6] > 0
                k_p = jnp.where(acc_p & ~blocked, 1, 0)
                keep_row = keep_row | jnp.where(iota_row == pi, k_p, 0)
            krow_ref[:] = keep_row

            # ---- Apply kept proposals (unrolled; static scalar pos) --
            for i in range(p):
                @pl.when(krow_ref[0, i] > 0)
                def _(i=i):
                    b_i = ids_ref[i, 0]
                    a_i = ids_ref[i, 1]
                    c_i = ids_ref[i, 2]
                    e_i = ids_ref[i, 4]
                    state_ref[pl.ds(b_i, 1), :] = rows_nb[pl.ds(i, 1), :]
                    state_ref[pl.ds(a_i, 1), :] = rows_na[pl.ds(i, 1), :]
                    state_ref[pl.ds(c_i, 1), _PAR:_PAR + 1] = \
                        jnp.full((1, 1), b_i, jnp.int32)
                    state_ref[pl.ds(e_i, 1), _PAR:_PAR + 1] = \
                        jnp.full((1, 1), a_i, jnp.int32)

            pos_ref[:] = jnp.where(valid_col, a_col,
                                   jnp.full((pp, 1), NULL, jnp.int32))

            n_applied = jnp.sum(keep_row)
            stats_ref[0:1, 0:1] = stats_ref[0:1, 0:1] + p
            stats_ref[0:1, 1:2] = (stats_ref[0:1, 1:2] +
                                   jnp.full((1, 1), n_applied,
                                            jnp.int32))

            # ---- Min tracking ----------------------------------------
            lt_new = log2_total()
            do_snap = lt_new < minlt_ref[0, 0]
            if defer_last_min:
                # the caller reslices after the last iteration and does
                # that iteration's snapshot itself (FW cadence parity)
                do_snap = do_snap & (it < k_iters - 1)

            @pl.when(do_snap)
            def _():
                minlt_ref[0:1, 0:1] = jnp.full((1, 1), lt_new,
                                               jnp.float32)
                dma_min = pltpu.make_async_copy(
                    state_ref, min_out_hbm.at[pl.ds(row0, n_rows), :],
                    dma_sem)
                dma_min.start()
                dma_min.wait()

            return 0

        jax.lax.fori_loop(0, k_iters, step, 0)

        dma_out = pltpu.make_async_copy(
            state_ref, state_out_hbm.at[pl.ds(row0, n_rows), :], dma_sem)
        dma_out.start()
        dma_out.wait()

    return kernel


def _pack_rows(c0, c1, par, lcc, inds, n_pad, width=None, slices=None):
    """[N,B]/[N,W,B] replica-minor arrays -> [B, rows, 128] i32 rows.

    With ``width``/``slices`` (finite-width layout) the inds lanes shift
    to ``_INDS_FW``, lane ``_WPRE`` holds the pre-slicing width, and one
    extra row block at index ``n_pad`` carries the per-replica slice
    lanes."""
    n, b = c0.shape
    w = inds.shape[1]
    fw = width is not None
    io = _INDS_FW if fw else _INDS
    n_rows = n_pad + 8 if fw else n_pad
    bc = jax.lax.bitcast_convert_type
    rows = jnp.zeros((b, n_rows, _LANES), jnp.int32)
    rows = rows.at[:, n:, _C0:_PAR + 1].set(NULL)
    rows = rows.at[:, n:, _LCC].set(
        bc(jnp.float32(_NEG_INF), jnp.int32))
    rows = rows.at[:, :n, _C0].set(c0.T)
    rows = rows.at[:, :n, _C1].set(c1.T)
    rows = rows.at[:, :n, _PAR].set(par.T)
    rows = rows.at[:, :n, _LCC].set(bc(lcc, jnp.int32).T)
    rows = rows.at[:, :n, io:io + w].set(
        bc(inds, jnp.int32).transpose(2, 0, 1))
    if fw:
        rows = rows.at[:, :n, _WPRE].set(bc(width, jnp.int32).T)
        rows = rows.at[:, n_pad, io:io + w].set(
            bc(slices, jnp.int32).T)
        # the slices row must look like a pad row to tree ops
        rows = rows.at[:, n_pad, _LCC].set(
            bc(jnp.float32(_NEG_INF), jnp.int32))
    return rows


def _unpack_rows(rows, n, w, fw=False):
    """[B, rows, 128] i32 -> replica-minor arrays (see _pack_rows)."""
    io = _INDS_FW if fw else _INDS
    bc = jax.lax.bitcast_convert_type
    c0 = rows[:, :n, _C0].T
    c1 = rows[:, :n, _C1].T
    par = rows[:, :n, _PAR].T
    lcc = bc(rows[:, :n, _LCC], jnp.float32).T
    inds = bc(rows[:, :n, io:io + w],
              jnp.uint32).transpose(1, 2, 0)
    if not fw:
        return c0, c1, par, lcc, inds
    n_pad = rows.shape[1] - 8
    width = bc(rows[:, :n, _WPRE], jnp.float32).T
    slices = bc(rows[:, n_pad, io:io + w], jnp.uint32).T
    return c0, c1, par, lcc, inds, width, slices


def run_walker(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
               n_walks: int, pos, sparse_wb=None, log2_n_projs=None,
               interpret: bool | None = None):
    """Same contract as :func:`sa_multiwalk.run_multiwalk` (IM only,
    dense cost model; sparse_wb unsupported).  ``interpret=None`` picks
    the Pallas interpreter automatically off-TPU."""
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    return _run_walker(batch, betas, log2d_w32, cfg, n_walks, pos,
                       sparse_wb, log2_n_projs, interpret)


@fts.partial(jax.jit,
             static_argnames=('cfg', 'n_walks', 'interpret'))
def _run_walker(batch: SABatch, betas, log2d_w32, cfg: SweepConfig,
                n_walks: int, pos, sparse_wb=None, log2_n_projs=None,
                interpret: bool = False):
    if sparse_wb is not None:
        raise NotImplementedError('walker engine: dense cost model only')
    n, b = batch.c0.shape
    w = batch.inds.shape[1]
    p = n_walks
    n_pad = _n_pad(n, cfg.n_leaves)
    k = int(betas.shape[0])

    # Precompute the draw streams (identical threefry draws to the
    # masked/MXU engines).
    def draw_step(keys, _):
        keys, leaf, rand_bit, u, _ = _draws(keys, cfg.n_leaves, p,
                                            log2d_w32.dtype, 4)
        return keys, (leaf, rand_bit, u)

    keys, (leaf, rand_bit, u) = jax.lax.scan(draw_step, batch.keys,
                                             None, length=k)
    # [K, P, B] -> per-replica [B, K8, P_pad] (K 8-aligned for tiling)
    k8 = -(-k // 8) * 8

    def to_blocks(x, fill, dtype):
        xp = jnp.full((k8, _LANES, b), fill, dtype)
        xp = xp.at[:k, :p, :].set(x.astype(dtype))
        return xp.transpose(2, 0, 1).reshape(b * k8, _LANES)

    leaf_b = to_blocks(leaf, 0, jnp.int32)
    bit_b = to_blocks(rand_bit, 0, jnp.int32)
    u_b = to_blocks(u, 1.0, jnp.float32)

    rows = _pack_rows(batch.c0, batch.c1, batch.par, batch.lcc,
                      batch.inds, n_pad).reshape(b * n_pad, _LANES)
    min_rows = _pack_rows(batch.min_c0, batch.min_c1, batch.min_par,
                          jnp.zeros_like(batch.lcc), batch.min_inds,
                          n_pad).reshape(b * n_pad, _LANES)
    pos_b = jnp.full((b, _LANES), NULL, jnp.int32)
    pos_b = pos_b.at[:, :p].set(pos.T).reshape(b * _LANES, 1)
    minlt = jnp.zeros((b, 8, _LANES), jnp.float32)
    minlt = minlt.at[:, 0, 0].set(batch.min_log2_total)
    minlt = minlt.reshape(b * 8, _LANES)

    # log2 dims laid out [32, 128]: log2d_t[s, _INDS + w] = log2 dim of
    # bit w*32 + s; zero elsewhere (id lanes contribute nothing).
    log2d_t = jnp.zeros((32, _LANES), jnp.float32)
    log2d_t = log2d_t.at[:, _INDS:_INDS + w].set(
        jnp.asarray(log2d_w32, jnp.float32).T)
    betas_col = jnp.asarray(betas, jnp.float32).reshape(k, 1)

    kernel = _make_kernel(cfg, n, w, p, k)

    def shared(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def per_rep(rows_per, width):
        return pl.BlockSpec((rows_per, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b * n_pad, _LANES), jnp.int32),   # state
        jax.ShapeDtypeStruct((b * n_pad, _LANES), jnp.int32),   # min
        jax.ShapeDtypeStruct((b * _LANES, 1), jnp.int32),       # pos
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.float32),     # minlt
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),       # stats
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            shared((32, _LANES)),          # log2d
            shared((k, 1)),                # betas
            per_rep(k8, _LANES),           # leaf
            per_rep(k8, _LANES),           # bit
            per_rep(k8, _LANES),           # u
            pl.BlockSpec(memory_space=pl.ANY),   # state in (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # min in (HBM)
            per_rep(_LANES, 1),            # pos in
            per_rep(8, _LANES),            # minlt in
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # state out (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # min out (HBM)
            per_rep(_LANES, 1),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, _LANES), jnp.int32),    # state (VMEM)
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_b
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_a
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_0
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_1
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_c
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_nb
            pltpu.VMEM((_LANES, _LANES), jnp.int32),   # rows_na
            pltpu.VMEM((_LANES, 8), jnp.int32),        # ids
            pltpu.VMEM((_LANES, 8), jnp.float32),      # fv (u draws)
            pltpu.VMEM((1, _LANES), jnp.int32),        # keep row
            pltpu.SemaphoreType.DMA(()),               # dma sem
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(log2d_t, betas_col, leaf_b, bit_b, u_b, rows, min_rows, pos_b,
      minlt)

    rows_out, min_out, pos_out, minlt_out, stats = outs
    rows_out = rows_out.reshape(b, n_pad, _LANES)
    min_out = min_out.reshape(b, n_pad, _LANES)
    c0, c1, par, lcc, inds = _unpack_rows(rows_out, n, w)
    mc0, mc1, mpar, _, minds = _unpack_rows(min_out, n, w)
    pos_out = pos_out.reshape(b, _LANES)[:, :p].T
    min_lt = minlt_out.reshape(b, 8, _LANES)[:, 0, 0]
    stats = stats.reshape(b, 8, _LANES)[:, 0, :]

    lt = _log2_total_b(lcc, cfg.n_leaves)
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    impn, impw = improved[None, :], improved[None, None, :]
    mc0 = jnp.where(impn, c0, mc0)
    mc1 = jnp.where(impn, c1, mc1)
    mpar = jnp.where(impn, par, mpar)
    minds = jnp.where(impw, inds, minds)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatch(c0, c1, par, inds, hyper, lcc, lt, min_lt, mc0, mc1,
                  mpar, minds, keys)
    moves = jnp.sum(stats[:, 0])
    applied = jnp.sum(stats[:, 1])
    return out, {'moves': moves, 'applied': applied, 'pos': pos_out}


def run_walker_fw(batch, betas, update_slices_mask, max_width,
                  log2d_w32, skip_wb, cfg, n_walks: int, pos,
                  sparse_wb=None, log2_n_projs=None,
                  interpret: bool | None = None):
    """Finite-width walker: same contract as
    :func:`sa_multiwalk.run_multiwalk_fw` (dense cost model only).

    ``update_slices_mask`` must be a HOST-known bool array: iterations
    run in kernel segments split at each reslice point; the greedy
    reslice-if-better itself runs in XLA between segments using the
    exact per-iteration jitter keys, so the trajectory is bit-identical
    to the masked FW multi-walk engine.
    """
    from tnco_tpu.kernels.sa_finite_batched import (SABatchFW,
                                                    _greedy_slices_b,
                                                    _lcc_fw_b)

    if sparse_wb is not None:
        raise NotImplementedError('walker engine: dense cost model only')
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    mask = np.asarray(update_slices_mask, dtype=bool)
    n, b = batch.c0.shape
    w = batch.inds.shape[1]
    p = n_walks
    n_pad = _n_pad(n, cfg.n_leaves)
    k = int(betas.shape[0])
    if mask.shape[0] != k:
        raise ValueError('mask length must match betas')
    betas = jnp.asarray(betas, jnp.float32)

    # Draw all iterations' streams upfront (5 keys: the 5th is the
    # reslice jitter, consumed whether or not the reslice runs).
    def draw_step(keys, _):
        keys, leaf, rand_bit, u, (k_res,) = _draws(
            keys, cfg.n_leaves, p, log2d_w32.dtype, 5)
        return keys, (leaf, rand_bit, u, k_res)

    keys, (leaf, rand_bit, u, k_res) = jax.lax.scan(
        draw_step, batch.keys, None, length=k)

    rows = _pack_rows(batch.c0, batch.c1, batch.par, batch.lcc,
                      batch.inds, n_pad, width=batch.width,
                      slices=batch.slices)
    min_rows = _pack_rows(batch.min_c0, batch.min_c1, batch.min_par,
                          jnp.zeros_like(batch.lcc), batch.min_inds,
                          n_pad, width=jnp.zeros_like(batch.width),
                          slices=batch.min_slices)
    min_lt = batch.min_log2_total
    moves = jnp.int32(0)
    applied = jnp.int32(0)
    mw = float(max_width)

    # Segments: [start, end) where mask[end-1] triggers a reslice.
    bounds = [0]
    for i in range(k):
        if mask[i]:
            bounds.append(i + 1)
    if bounds[-1] != k:
        bounds.append(k)

    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        reslice_at_end = bool(mask[s1 - 1])
        rows, min_rows, pos, min_lt, st = _walker_fw_segment(
            rows, min_rows, pos, min_lt, betas[s0:s1],
            leaf[s0:s1], rand_bit[s0:s1], u[s0:s1], log2d_w32, cfg,
            p, mw, reslice_at_end, interpret)
        moves = moves + st[0]
        applied = applied + st[1]
        if reslice_at_end:
            rows, min_rows, min_lt = _walker_fw_reslice(
                rows, min_rows, min_lt, k_res[s1 - 1], mw, log2d_w32,
                skip_wb, cfg, n, w)

    (c0, c1, par, lcc, inds, width_pre,
     slices) = _unpack_rows(rows.reshape(b, n_pad + 8, _LANES), n, w,
                            fw=True)
    (mc0, mc1, mpar, _, minds, _,
     mslices) = _unpack_rows(min_rows.reshape(b, n_pad + 8, _LANES), n,
                             w, fw=True)
    lt = _log2_total_b(lcc, cfg.n_leaves)
    improved = lt < min_lt
    min_lt = jnp.where(improved, lt, min_lt)
    impn, impw = improved[None, :], improved[None, None, :]
    mc0 = jnp.where(impn, c0, mc0)
    mc1 = jnp.where(impn, c1, mc1)
    mpar = jnp.where(impn, par, mpar)
    minds = jnp.where(impw, inds, minds)
    mslices = jnp.where(impn, slices, mslices)
    hyper = compute_hyper_b(c0, c1, inds)
    out = SABatchFW(c0, c1, par, inds, hyper, lcc, width_pre, slices,
                    lt, min_lt, mc0, mc1, mpar, minds, mslices, keys)
    return out, {'moves': moves, 'applied': applied, 'pos': pos}


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'max_width',
                                       'defer_last_min', 'interpret'))
def _walker_fw_segment(rows, min_rows, pos, min_lt, betas, leaf,
                       rand_bit, u, log2d_w32, cfg, n_walks, max_width,
                       defer_last_min, interpret):
    b = rows.shape[0]
    n_rows = rows.shape[1]
    p = n_walks
    k = betas.shape[0]
    w = log2d_w32.shape[0]
    k8 = -(-k // 8) * 8

    def to_blocks(x, fill, dtype):
        xp = jnp.full((k8, _LANES, b), fill, dtype)
        xp = xp.at[:k, :p, :].set(x.astype(dtype))
        return xp.transpose(2, 0, 1).reshape(b * k8, _LANES)

    leaf_b = to_blocks(leaf, 0, jnp.int32)
    bit_b = to_blocks(rand_bit, 0, jnp.int32)
    u_b = to_blocks(u, 1.0, jnp.float32)
    pos_b = jnp.full((b, _LANES), NULL, jnp.int32)
    pos_b = pos_b.at[:, :p].set(pos.T).reshape(b * _LANES, 1)
    minlt = jnp.zeros((b, 8, _LANES), jnp.float32)
    minlt = minlt.at[:, 0, 0].set(min_lt)
    minlt = minlt.reshape(b * 8, _LANES)

    log2d_t = jnp.zeros((32, _LANES), jnp.float32)
    log2d_t = log2d_t.at[:, _INDS_FW:_INDS_FW + w].set(
        jnp.asarray(log2d_w32, jnp.float32).T)
    betas_col = betas.reshape(k, 1)

    # n for the kernel is the true node count: recover from cfg
    n_true = 2 * cfg.n_leaves - 1
    kernel = _make_kernel(cfg, n_true, w, p, k, fw=True,
                          max_width=max_width,
                          defer_last_min=defer_last_min)

    def shared(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def per_rep(rows_per, width_):
        return pl.BlockSpec((rows_per, width_), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b * n_rows, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((b * n_rows, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((b * _LANES, 1), jnp.int32),
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            shared((32, _LANES)),
            shared((k, 1)),
            per_rep(k8, _LANES),
            per_rep(k8, _LANES),
            per_rep(k8, _LANES),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            per_rep(_LANES, 1),
            per_rep(8, _LANES),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            per_rep(_LANES, 1),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, 8), jnp.int32),
            pltpu.VMEM((_LANES, 8), jnp.float32),
            pltpu.VMEM((1, _LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(log2d_t, betas_col, leaf_b, bit_b, u_b,
      rows.reshape(b * n_rows, _LANES),
      min_rows.reshape(b * n_rows, _LANES), pos_b, minlt)
    rows_o, min_o, pos_o, minlt_o, stats = outs
    pos_o = pos_o.reshape(b, _LANES)[:, :p].T
    stats = stats.reshape(b, 8, _LANES)[:, 0, :]
    return (rows_o.reshape(b, n_rows, _LANES),
            min_o.reshape(b, n_rows, _LANES), pos_o,
            minlt_o.reshape(b, 8, _LANES)[:, 0, 0],
            (jnp.sum(stats[:, 0]), jnp.sum(stats[:, 1])))


@fts.partial(jax.jit, static_argnames=('cfg', 'n', 'w', 'max_width'))
def _walker_fw_reslice(rows, min_rows, min_lt, k_res, max_width,
                       log2d_w32, skip_wb, cfg, n, w):
    """XLA-side greedy reslice-if-better + the deferred min snapshot
    (bit-identical to _iter_multiwalk_fw's in-scan cadence)."""
    from tnco_tpu.kernels.sa_finite_batched import (_greedy_slices_b,
                                                    _lcc_fw_b)

    b = rows.shape[0]
    n_pad = rows.shape[1] - 8
    (c0, c1, par, lcc, inds, width_pre,
     slices) = _unpack_rows(rows, n, w, fw=True)

    new_slices = _greedy_slices_b(c0, inds, width_pre, k_res,
                                  jnp.float32(max_width), log2d_w32,
                                  skip_wb, None, None)
    new_lcc = _lcc_fw_b(c0, c1, inds, new_slices, log2d_w32, None, None)
    better = (_log2_total_b(new_lcc, cfg.n_leaves) <
              _log2_total_b(lcc, cfg.n_leaves))
    has_slices = jnp.any(slices != 0)
    take = better & has_slices
    slices = jnp.where(take[None, :], new_slices, slices)
    lcc = jnp.where(take[None, :], new_lcc, lcc)

    bc = jax.lax.bitcast_convert_type
    rows = rows.at[:, :n, _LCC].set(bc(lcc, jnp.int32).T)
    rows = rows.at[:, n_pad, _INDS_FW:_INDS_FW + w].set(
        bc(slices, jnp.int32).T)

    lt_new = _log2_total_b(lcc, cfg.n_leaves)
    improved = lt_new < min_lt
    min_lt = jnp.where(improved, lt_new, min_lt)
    min_rows = jnp.where(improved[:, None, None], rows, min_rows)
    return rows, min_rows, min_lt
