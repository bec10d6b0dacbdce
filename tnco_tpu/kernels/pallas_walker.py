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

__all__ = ['run_walker', 'run_walker_sharded', 'walker_supported']

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
    zero-padded tree) and the row count must be 128-aligned so the
    transposed column cache sweeps whole [128, 128] blocks."""
    return -(-(n_leaves + _pow2(n - n_leaves)) // _LANES) * _LANES


def _make_kernel(cfg: SweepConfig, n: int, w: int, p: int, k_iters: int,
                 fw: bool = False, max_width: float = 0.0,
                 defer_last_min: bool = False):
    """Vectorized (v2) walker kernel.

    v1 resolved and applied each walk with Python-unrolled serial
    scalar/row accesses (~1.5us per walk per iteration on v5e — the
    measured 3.5e5 proposals/s plateau).  v2 keeps the replica state in
    a TRANSPOSED column cache ``t_ref`` ([128 feature sublanes, n_rows
    lanes]) and replaces both serial loops with block sweeps over
    Mosaic's lane-wise ``dynamic_gather``:

    - gathers: a node's column is fetched for all P walks at once per
      128-lane block (``jnp.take_along_axis(block, ids, axis=1)``),
      accumulated across blocks with in-range selects — 7 gather
      rounds per iteration, O(n_rows/128) tile ops each;
    - scatter: kept walks' updated columns (B, A full columns; C, E
      par-lane fixes) are matched per block with a transpose-broadcast
      equality matrix + pinned sublane-halving index-sum (kept sets are
      pairwise disjoint, so each lane has at most one hit), then
      written back with one gather per source bank.

    The float op sequences (width trees, exp2/log2 accept math) are
    transcribed 1:1 from v1, so trajectories remain bit-identical to
    :func:`sa_multiwalk.run_multiwalk`.
    """
    n_leaves = cfg.n_leaves
    n_int_pad = _pow2(n - n_leaves)
    pp = _LANES  # walk lanes padded to the vector width
    wp = _pow2(w)
    io = _INDS_FW if fw else _INDS  # first inds feature sublane
    n_slices = _n_pad(n, n_leaves)  # slices column index (FW layout)
    mw = np.float32(max_width)

    n_rows = _n_pad(n, n_leaves) + (_LANES if fw else 0)
    nb = n_rows // _LANES  # gather/scatter sweep blocks

    def kernel(log2d_ref, betas_ref, leaf_ref, bit_ref, u_ref,
               state_hbm, min_hbm, pos_in, minlt_in,
               state_out_hbm, min_out_hbm, pos_ref, minlt_ref, stats_ref,
               state_ref, t_ref, dma_sem):
        # State and min stay in HBM (a VMEM-blocked pipeline of the
        # state quadruple exceeds the 16MB scoped budget at Sycamore
        # scale); one replica's rows are DMA'd into VMEM for the whole
        # K-iteration chunk and transposed into the column cache.
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
        for kb in range(nb):
            t_ref[:, kb * _LANES:(kb + 1) * _LANES] = jnp.transpose(
                state_ref[kb * _LANES:(kb + 1) * _LANES, :])

        iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES),
                                            0)
        iota_sub_col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
        valid_row = iota_lane < p
        inds_sub = (iota_sub_col >= io) & (iota_sub_col < io + w)

        def u32(x):
            return jax.lax.bitcast_convert_type(x, jnp.uint32)

        def i32(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def f32(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        def tb(row):
            """[1,128] row -> [128,128] with row[0,i] on sublane i (the
            transpose-broadcast: lane-gather at the sublane index)."""
            return jnp.take_along_axis(
                jnp.broadcast_to(row, (_LANES, _LANES)), iota_sub, axis=1)

        def gather_cols(ids_row):
            """State columns of ``ids_row`` ([1,128] node ids) for all
            walks at once: [128 features, 128 walks].  Zero columns for
            NULL ids (matches v1's ``row_of``)."""
            idxb = jnp.broadcast_to(ids_row, (_LANES, _LANES))
            out = jnp.zeros((_LANES, _LANES), jnp.int32)
            for kb in range(nb):
                blk = t_ref[:, kb * _LANES:(kb + 1) * _LANES]
                loc = jnp.clip(idxb - kb * _LANES, 0, _LANES - 1)
                g = jnp.take_along_axis(blk, loc, axis=1)
                hit = (idxb >= kb * _LANES) & (idxb < (kb + 1) * _LANES)
                out = jnp.where(hit, g, out)
            return out

        def halve_sub(t):
            """Pinned sublane-halving sum to [1, lanes]."""
            while t.shape[0] > 1:
                h = t.shape[0] // 2
                t = t[:h] + t[h:]
            return t

        def any_bits(x_u32):
            """[128,128] uint32 columns -> [1,128] bool (inds features
            only).  Integer counts: order-free, same booleans as v1."""
            nz = jnp.where(i32(x_u32) != 0, 1, 0)[io:io + w, :]
            if wp != w:
                nz = jnp.concatenate(
                    [nz, jnp.zeros((wp - w, nz.shape[1]), jnp.int32)],
                    axis=0)
            return halve_sub(nz) > 0

        def width_pinned(cols_u32):
            """[128,128] columns -> [1,128] f32 width; exact pinned
            pairing (w-major halving per bit, then bit halving) — the
            identical float op tree to v1/bitops.pairwise_sum_last."""
            xw = cols_u32[io:io + w, :]
            per_s = []
            for s in range(32):
                bits = i32((xw >> jnp.uint32(s)) &
                           jnp.uint32(1)).astype(jnp.float32)
                t = bits * log2d_ref[0:w, s:s + 1]
                if wp != w:
                    t = jnp.concatenate(
                        [t, jnp.zeros((wp - w, t.shape[1]), jnp.float32)],
                        axis=0)
                per_s.append(halve_sub(t))
            while len(per_s) > 1:
                h = len(per_s) // 2
                per_s = [per_s[i] + per_s[i + h] for i in range(h)]
            return per_s[0]

        def log2_total():
            lcc_full = f32(t_ref[_LCC:_LCC + 1, :])
            win = lcc_full[:, n_leaves:n_leaves + n_int_pad]
            m = jnp.max(win, axis=1, keepdims=True)
            t = jnp.exp2(win - m)
            while t.shape[1] > 1:
                h = t.shape[1] // 2
                t = t[:, :h] + t[:, h:]
            return (m + jnp.log2(t))[0, 0]

        def set_feat(base, feat, row_vals):
            return jnp.where(iota_sub_col == feat,
                             jnp.broadcast_to(row_vals, (_LANES, _LANES)),
                             base)

        def transpose_back():
            for kb in range(nb):
                state_ref[kb * _LANES:(kb + 1) * _LANES, :] = \
                    jnp.transpose(t_ref[:, kb * _LANES:(kb + 1) * _LANES])

        def step(it, lt):
            # ---- Resolve ids + gather columns (4 dependent rounds) ---
            leaf_row = leaf_ref[pl.ds(it, 1), :]
            bit_row = bit_ref[pl.ds(it, 1), :]
            u_row = u_ref[pl.ds(it, 1), :]
            pos_row = pos_ref[0:1, :]

            cols_pos = gather_cols(pos_row)
            cols_leaf = gather_cols(leaf_row)
            par_pos = jnp.where(pos_row < 0, NULL,
                                cols_pos[_PAR:_PAR + 1, :])
            new_pos = cols_leaf[_PAR:_PAR + 1, :]
            boundary = (pos_row == NULL) | (par_pos == NULL)
            b_row = jnp.where(boundary, new_pos, pos_row)

            cols_b = gather_cols(b_row)
            a_row = cols_b[_PAR:_PAR + 1, :]
            c0b_row = cols_b[_C0:_C0 + 1, :]
            c1b_row = cols_b[_C1:_C1 + 1, :]

            cols_a = gather_cols(a_row)
            cols_0 = gather_cols(c0b_row)
            cols_1 = gather_cols(c1b_row)
            c0a_row = cols_a[_C0:_C0 + 1, :]
            c_row = jnp.where(c0a_row == b_row, cols_a[_C1:_C1 + 1, :],
                              c0a_row)
            cols_c = gather_cols(c_row)

            # ---- Vector phase (identical float ops, transposed) ------
            i0 = any_bits(u32(cols_0) & u32(cols_c))
            i1 = any_bits(u32(cols_1) & u32(cols_c))
            both = i0 & i1
            rand_b = bit_row > 0
            pick_rand = both if not cfg.disable_shared_inds else \
                jnp.ones_like(both)
            take0 = (pick_rand & rand_b) | (~pick_rand & i0)
            d_row = jnp.where(take0, c0b_row, c1b_row)
            e_row = jnp.where(take0, c1b_row, c0b_row)
            cols_e = jnp.where(take0, cols_1, cols_0)
            inds_d = jnp.where(take0, u32(cols_0), u32(cols_1))
            inds_e = jnp.where(take0, u32(cols_1), u32(cols_0))
            hyp_a = u32(cols_a) & u32(cols_b) & u32(cols_c)
            hyp_b = u32(cols_b) & u32(cols_0) & u32(cols_1)
            new_inds_b = ((inds_d ^ u32(cols_c)) | hyp_a | hyp_b) & \
                jnp.where(inds_sub, jnp.uint32(0xFFFFFFFF),
                          jnp.uint32(0))

            l_a = f32(cols_a[_LCC:_LCC + 1, :])
            l_b = f32(cols_b[_LCC:_LCC + 1, :])
            if fw:
                sl_col = u32(
                    t_ref[:, n_slices:n_slices + _LANES][:, 0:1])
                new_width_b = width_pinned(new_inds_b)
                new_sliced_width_b = width_pinned(new_inds_b & ~sl_col)
                fits = new_sliced_width_b <= mw + _WIDTH_EPS
                ln_b = width_pinned((inds_d | u32(cols_c)) | sl_col)
                ln_a = width_pinned((new_inds_b | inds_e) | sl_col)
            else:
                ln_b = width_pinned(inds_d | u32(cols_c))
                ln_a = width_pinned(new_inds_b | inds_e)

            m = jnp.maximum(lt, jnp.maximum(ln_a, ln_b))
            s = (jnp.exp2(lt - m) - jnp.exp2(l_a - m) -
                 jnp.exp2(l_b - m) + jnp.exp2(ln_a - m) +
                 jnp.exp2(ln_b - m))
            l_new = m + jnp.log2(jnp.maximum(s, _SCALED_FLOOR))

            beta = betas_ref[pl.ds(it, 1), :][0, 0]
            if cfg.prob_kind == 'mh':
                acc = jnp.log2(u_row) <= -beta * (l_new - lt)
            elif cfg.prob_kind == 'greedy':
                acc = l_new <= lt
            else:
                acc = jnp.ones_like(l_new, dtype=bool)
            accept = acc & (b_row != NULL) & (a_row != NULL) & valid_row
            if fw:
                accept = accept & fits

            # New B and A columns, fully vectorized.
            v_b = cols_b
            v_b = set_feat(v_b, _C0,
                           jnp.where(c0b_row == e_row, c_row, c0b_row))
            v_b = set_feat(v_b, _C1,
                           jnp.where(c1b_row == e_row, c_row, c1b_row))
            v_b = set_feat(v_b, _PAR, a_row)
            v_b = set_feat(v_b, _LCC, i32(l_b + (ln_b - l_b)))
            if fw:
                w_b = f32(cols_b[_WPRE:_WPRE + 1, :])
                v_b = set_feat(v_b, _WPRE,
                               i32(w_b + (new_width_b - w_b)))
            v_b = jnp.where(inds_sub, i32(new_inds_b), v_b)
            c0a_col = cols_a[_C0:_C0 + 1, :]
            c1a_col = cols_a[_C1:_C1 + 1, :]
            v_a = cols_a
            v_a = set_feat(v_a, _C0,
                           jnp.where(c0a_col == c_row, e_row, c0a_col))
            v_a = set_feat(v_a, _C1,
                           jnp.where(c1a_col == c_row, e_row, c1a_col))
            v_a = set_feat(v_a, _LCC, i32(l_a + (ln_a - l_a)))
            v_c = set_feat(cols_c, _PAR, b_row)
            v_e = set_feat(cols_e, _PAR, a_row)

            # ---- Priority conflict filter ----------------------------
            # conf[p, q] = walks p and q share any of their 5 nodes
            # (all 5x5 ordered id pairs).  The sequential priority scan
            # mirrors _claim_disjoint exactly: lower walk index wins;
            # only KEPT walks block.
            id_rows = (b_row, a_row, c_row, d_row, e_row)
            conf = jnp.zeros((pp, pp), jnp.int32)
            for x in id_rows:
                xt = tb(x)
                for y in id_rows:
                    conf = conf | jnp.where(xt == y, 1, 0)

            acc_row = jnp.where(accept, 1, 0)
            keep_row = jnp.zeros((1, pp), jnp.int32)
            for pi in range(p):
                conf_p = conf[pi:pi + 1, :]
                blocked = jnp.sum(
                    jnp.where((keep_row > 0) & (conf_p > 0) &
                              (iota_lane < pi), 1, 0)) > 0
                acc_p = acc_row[0, pi] > 0
                k_p = jnp.where(acc_p & ~blocked, 1, 0)
                keep_row = keep_row | jnp.where(iota_lane == pi, k_p, 0)

            # ---- Apply kept proposals (vectorized block scatter) -----
            # Kept walks' {B,A,C,E} are pairwise disjoint, so each state
            # column has at most one hit; the per-block (1+index) sum
            # recovers the unique source walk exactly.
            kmask = keep_row > 0
            null_row = jnp.full((1, pp), -1, jnp.int32)

            def eff(x):
                return jnp.where(kmask, x, null_row)

            x_cat = jnp.concatenate(
                [tb(eff(b_row)), tb(eff(a_row)), tb(eff(c_row)),
                 tb(eff(e_row))], axis=1)
            iota4 = jnp.concatenate([iota_lane] * 4, axis=1)
            encp = jnp.concatenate([iota_sub + 1] * 4, axis=1)
            for kb in range(nb):
                eq = jnp.where(x_cat == iota4 + kb * _LANES, encp, 0)
                s_all = halve_sub(eq)
                s_b = s_all[:, 0 * _LANES:1 * _LANES]
                s_a = s_all[:, 1 * _LANES:2 * _LANES]
                s_c = s_all[:, 2 * _LANES:3 * _LANES]
                s_e = s_all[:, 3 * _LANES:4 * _LANES]
                blk = t_ref[:, kb * _LANES:(kb + 1) * _LANES]

                def pick(v, s_row):
                    idxr = jnp.broadcast_to(
                        jnp.clip(s_row - 1, 0, _LANES - 1),
                        (_LANES, _LANES))
                    return jnp.take_along_axis(v, idxr, axis=1)

                new = jnp.where(s_b > 0, pick(v_b, s_b),
                                jnp.where(s_a > 0, pick(v_a, s_a),
                                          jnp.where(s_c > 0,
                                                    pick(v_c, s_c),
                                                    jnp.where(
                                                        s_e > 0,
                                                        pick(v_e, s_e),
                                                        blk))))
                t_ref[:, kb * _LANES:(kb + 1) * _LANES] = new

            pos_ref[0:1, :] = jnp.where(valid_row, a_row,
                                        jnp.full((1, pp), NULL,
                                                 jnp.int32))

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
                transpose_back()
                dma_min = pltpu.make_async_copy(
                    state_ref, min_out_hbm.at[pl.ds(row0, n_rows), :],
                    dma_sem)
                dma_min.start()
                dma_min.wait()

            return lt_new

        jax.lax.fori_loop(0, k_iters, step, log2_total())

        transpose_back()
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
    n_rows = n_pad + _LANES if fw else n_pad
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
    n_pad = rows.shape[1] - _LANES
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
    pos_b = jnp.full((b, 8, _LANES), NULL, jnp.int32)
    pos_b = pos_b.at[:, 0, :p].set(pos.T).reshape(b * 8, _LANES)
    minlt = jnp.zeros((b, 8, _LANES), jnp.float32)
    minlt = minlt.at[:, 0, 0].set(batch.min_log2_total)
    minlt = minlt.reshape(b * 8, _LANES)

    # log2 dims laid out [128, 128]: log2d_t[word, s] = log2 dim of bit
    # word*32 + s; zero elsewhere.
    log2d_t = jnp.zeros((_LANES, _LANES), jnp.float32)
    log2d_t = log2d_t.at[:w, :32].set(
        jnp.asarray(log2d_w32, jnp.float32))
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
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),       # pos
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.float32),     # minlt
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),       # stats
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            shared((_LANES, _LANES)),      # log2d
            shared((k, 1)),                # betas
            per_rep(k8, _LANES),           # leaf
            per_rep(k8, _LANES),           # bit
            per_rep(k8, _LANES),           # u
            pl.BlockSpec(memory_space=pl.ANY),   # state in (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # min in (HBM)
            per_rep(8, _LANES),            # pos in
            per_rep(8, _LANES),            # minlt in
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # state out (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # min out (HBM)
            per_rep(8, _LANES),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, _LANES), jnp.int32),    # state rows
            pltpu.VMEM((_LANES, n_pad), jnp.int32),    # column cache
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
    pos_out = pos_out.reshape(b, 8, _LANES)[:, 0, :p].T
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
     slices) = _unpack_rows(rows.reshape(b, n_pad + _LANES, _LANES), n, w,
                            fw=True)
    (mc0, mc1, mpar, _, minds, _,
     mslices) = _unpack_rows(min_rows.reshape(b, n_pad + _LANES, _LANES), n,
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
    pos_b = jnp.full((b, 8, _LANES), NULL, jnp.int32)
    pos_b = pos_b.at[:, 0, :p].set(pos.T).reshape(b * 8, _LANES)
    minlt = jnp.zeros((b, 8, _LANES), jnp.float32)
    minlt = minlt.at[:, 0, 0].set(min_lt)
    minlt = minlt.reshape(b * 8, _LANES)

    log2d_t = jnp.zeros((_LANES, _LANES), jnp.float32)
    log2d_t = log2d_t.at[:w, :32].set(
        jnp.asarray(log2d_w32, jnp.float32))
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
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b * 8, _LANES), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            shared((_LANES, _LANES)),
            shared((k, 1)),
            per_rep(k8, _LANES),
            per_rep(k8, _LANES),
            per_rep(k8, _LANES),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
            per_rep(8, _LANES),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, _LANES), jnp.int32),
            pltpu.VMEM((_LANES, n_rows), jnp.int32),
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
    pos_o = pos_o.reshape(b, 8, _LANES)[:, 0, :p].T
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
    n_pad = rows.shape[1] - _LANES
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


# --------------------------- multi-chip ---------------------------


def run_walker_sharded(batch, betas, log2d_w32, cfg: SweepConfig,
                       n_walks: int, pos, mesh, sparse_wb=None,
                       log2_n_projs=None, *, interpret: bool | None = None,
                       fw_args=None):
    """Replica-sharded walker over a ``jax.sharding.Mesh``.

    ``shard_map`` hands every device its local replica shard and runs
    the Pallas kernel on per-device shapes — the supported pattern for
    Mosaic custom calls on pods (plain ``jit`` over sharded inputs
    would ask GSPMD to partition the custom call, which it cannot).
    Replicas are independent, so per-replica trajectories are
    bit-identical to the single-device engine (enforced on the virtual
    CPU mesh by tests/test_walker.py).  ``moves``/``applied`` are
    psum-reduced to replicated scalars.

    ``fw_args=(update_slices_mask, max_width, skip_wb)`` switches to
    the finite-width walker (``batch`` then is a ``SABatchFW``); the
    mask must be HOST-known (it segments the kernel at reslice points,
    see :func:`run_walker_fw`) and is treated as static.

    Pod-scale execution per SURVEY.md §2.3: replicas over ICI/DCN mesh
    axes, exchange collectives layered outside
    (``parallel.replicas.exchange_best_sharded``).
    """
    if sparse_wb is not None:
        raise NotImplementedError('walker engine: dense cost model only')
    if interpret is None:
        interpret = jax.devices()[0].platform != 'tpu'
    if fw_args is None:
        mask = None
        max_width = None
        skip_wb = jnp.zeros((), jnp.uint32)   # placeholder leaf
    else:
        mask, max_width, skip_wb = fw_args
        mask = tuple(bool(x) for x in np.asarray(mask))
        max_width = float(max_width)
    return _run_walker_sharded(batch, betas, log2d_w32, cfg, n_walks,
                               pos, mesh, jnp.asarray(skip_wb),
                               log2_n_projs, mask, max_width,
                               bool(interpret))


@fts.partial(jax.jit, static_argnames=('cfg', 'n_walks', 'mesh',
                                       'log2_n_projs', 'mask',
                                       'max_width', 'interpret'))
def _run_walker_sharded(batch, betas, log2d_w32, cfg, n_walks, pos,
                        mesh, skip_wb, log2_n_projs, mask, max_width,
                        interpret):
    from jax.sharding import PartitionSpec as P

    from tnco_tpu.kernels.sa_walks import _batch_specs

    axes = tuple(mesh.axis_names)
    specs = _batch_specs(batch, axes)
    pos_spec = P(None, axes)
    rep = P()
    fw = mask is not None

    def body(b, pos_, betas_, log2d_, skip_):
        if fw:
            out, m = run_walker_fw(b, betas_, np.asarray(mask, bool),
                                   max_width, log2d_, skip_, cfg,
                                   n_walks, pos_, None, log2_n_projs,
                                   interpret=interpret)
        else:
            out, m = _run_walker(b, betas_, log2d_, cfg, n_walks, pos_,
                                 None, log2_n_projs, interpret)
        m = dict(m)
        m['moves'] = jax.lax.psum(m['moves'], axes)
        m['applied'] = jax.lax.psum(m['applied'], axes)
        return out, m

    metric_specs = {'moves': rep, 'applied': rep, 'pos': pos_spec}
    shmap = jax.shard_map(body, mesh=mesh,
                          in_specs=(specs, pos_spec, rep, rep, rep),
                          out_specs=(specs, metric_specs),
                          check_vma=False)
    return shmap(batch, pos, betas, log2d_w32, skip_wb)
