"""Pallas TPU streaming SA kernel: VMEM-resident, fori-only, hang-safe.

The production-grade Pallas engine.  Combines two designs:

- **VMEM residency** (from the deleted pallas_sweep experiment): a
  replica block's entire
  state lives in VMEM for a whole chunk of iterations; HBM is touched once
  per chunk.
- **Continuous move stream** (from ``sa_batched.run_stream_batched``):
  every lane is always busy — a lane that reaches the root closes its sweep
  (min snapshot, next leaf, next beta) in that iteration and continues.
  No data-dependent loops at all: one ``fori_loop`` over a static iteration
  count, so the kernel is immune to the Mosaic ``while_loop`` issues that
  wedge the chip (lesson from the deleted pallas_sweep lockstep
  variant: its while_loop miscompiled and wedged the chip; findings
  recorded in docs/ROADMAP.md).

Per-lane semantics match the reference SA: K sweeps over the beta ramp,
each sweep a leaf-to-root walk of uncle swaps with Metropolis acceptance in
the log2 domain.  RNG is the TPU core PRNG seeded per (block, chunk) —
deterministic, but a different stream family than the threefry engines.
"""

import functools as fts

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnco_tpu.kernels.sa_batched import SABatch
from tnco_tpu.kernels.sa_infinite import SweepConfig

__all__ = ['run_stream_pallas', 'stream_vmem_bytes']

NULL = -1


def stream_vmem_bytes(n: int, w: int, block_b: int) -> int:
    """Approximate VMEM bytes per replica block."""
    per_node = 7 * 4                    # c0,c1,par,lcc + min copies
    per_lane_row = 3 * w * 4            # inds, hyper, min_inds
    return n * block_b * (per_node + per_lane_row) + 256 * 1024


def _make_kernel(cfg: SweepConfig, n: int, w: int, block_b: int,
                 n_iters: int, n_sweeps: int):
    n_leaves = cfg.n_leaves
    bk = block_b

    def kernel(betas_ref, log2d_ref, seed_ref,
               c0_in, c1_in, par_in, inds_in, hyper_in, lcc_in, minlt_in,
               minc0_in, minc1_in, minpar_in, mininds_in, pos_in, cnt_in,
               c0_ref, c1_ref, par_ref, inds_ref, hyper_ref, lcc_ref,
               minlt_ref, minc0_ref, minc1_ref, minpar_ref, mininds_ref,
               pos_ref, cnt_ref, moves_ref, dma_sem):
        block = pl.program_id(0)

        # The kernel mutates the output VMEM blocks in place.  Inputs stay
        # in HBM (ANY) to halve the VMEM pipeline footprint; seed the
        # output blocks with one DMA each (the output blocks are NOT
        # pre-filled from the aliased inputs on multi-block grids —
        # aliasing only shares HBM storage).
        col = block * bk
        for src, dst in ((c0_in, c0_ref), (c1_in, c1_ref),
                         (par_in, par_ref), (inds_in, inds_ref),
                         (hyper_in, hyper_ref), (lcc_in, lcc_ref),
                         (minlt_in, minlt_ref), (minc0_in, minc0_ref),
                         (minc1_in, minc1_ref), (minpar_in, minpar_ref),
                         (mininds_in, mininds_ref), (pos_in, pos_ref),
                         (cnt_in, cnt_ref)):
            dma = pltpu.make_async_copy(
                src.at[:, pl.ds(col, bk)], dst, dma_sem)
            dma.start()
            dma.wait()
        # Mosaic supports at most 2 seed words: fold the block id in.
        pltpu.prng_seed(seed_ref[0] + block * 1000003, seed_ref[1])

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bk), 0)
        log2d = log2d_ref[:]  # [w*32, 1]
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (w, 32, 1), 1)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (n_sweeps, bk), 0)
        betas_col = betas_ref[:]  # [n_sweeps, 1] f32

        def rbits_i32():
            return jax.lax.bitcast_convert_type(
                pltpu.prng_random_bits((1, bk)), jnp.int32)

        def runif():
            return ((rbits_i32() & 0xFFFFFF).astype(jnp.float32) *
                    np.float32(2.0**-24))

        def row_mask(pos):
            return iota_n == pos

        def grow_i(arr, mask):
            return jnp.sum(jnp.where(mask, arr, 0), axis=0, keepdims=True)

        def grow_f(arr, mask):
            return jnp.sum(jnp.where(mask, arr, 0.0), axis=0,
                           keepdims=True)

        def gather_lanes(ref, mask):
            arr = ref[:].reshape(n, w, bk)
            sel = jnp.where(mask[:, None, :], arr, jnp.uint32(0))
            sel_i = jax.lax.bitcast_convert_type(sel, jnp.int32)
            return jax.lax.bitcast_convert_type(
                jnp.sum(sel_i, axis=0), jnp.uint32)

        def any_lanes(lanes_wb):
            # jnp.any over uint32 lowers through an unsupported i8->i1
            # truncation in this Mosaic; compare as int32 instead.
            x = jax.lax.bitcast_convert_type(lanes_wb, jnp.int32)
            nz = jnp.sum(jnp.where(x != 0, 1, 0), axis=0, keepdims=True)
            return nz > 0

        def width(lanes_wb):
            bits = jax.lax.bitcast_convert_type(
                (lanes_wb[:, None, :] >> shifts) & jnp.uint32(1),
                jnp.int32).astype(jnp.float32)
            return jnp.sum(bits * log2d.reshape(w, 32, 1),
                           axis=(0, 1)).reshape(1, bk)

        def log2_total():
            internal = lcc_ref[n_leaves:, :]
            m = jnp.max(internal, axis=0, keepdims=True)
            s = jnp.sum(jnp.exp2(internal - m), axis=0, keepdims=True)
            return m + jnp.log2(s)

        moves_ref[:] = jnp.zeros((1, bk), jnp.int32)

        def step(it, _):
            pos_b = pos_ref[:]
            cnt = cnt_ref[:]
            running = cnt < n_sweeps
            lt = log2_total()

            par_pos = grow_i(par_ref[:], row_mask(pos_b))
            at_boundary = running & ((pos_b == NULL) | (par_pos == NULL))
            walking = running & jnp.logical_not(at_boundary)

            # -- Sweep boundary: min snapshot, new leaf, next beta ------
            improved = at_boundary & (lt < minlt_ref[:])
            minlt_ref[:] = jnp.where(improved, lt, minlt_ref[:])
            imp_n = jnp.broadcast_to(improved, (n, bk))
            minc0_ref[:] = jnp.where(imp_n, c0_ref[:], minc0_ref[:])
            minc1_ref[:] = jnp.where(imp_n, c1_ref[:], minc1_ref[:])
            minpar_ref[:] = jnp.where(imp_n, par_ref[:], minpar_ref[:])
            imp_w = jnp.broadcast_to(improved[:, None, :], (n, w, bk))
            mininds_ref[:] = jnp.where(
                imp_w, inds_ref[:].reshape(n, w, bk),
                mininds_ref[:].reshape(n, w, bk)).reshape(n * w, bk)

            leaf = (rbits_i32() & 0x7FFFFFFF) % jnp.int32(n_leaves)
            new_pos = grow_i(par_ref[:], row_mask(leaf))
            pos_b = jnp.where(at_boundary, new_pos, pos_b)
            cnt = jnp.where(at_boundary, cnt + 1, cnt)
            cnt_ref[:] = cnt

            # per-lane beta via one-hot over the (small) schedule table
            beta = jnp.sum(
                jnp.where(iota_k == jnp.clip(cnt - 1, 0, n_sweeps - 1),
                          jnp.broadcast_to(betas_col, (n_sweeps, bk)),
                          0.0), axis=0, keepdims=True)

            # -- Walk step ----------------------------------------------
            b = jnp.where(walking, pos_b, 0)
            m_b = row_mask(b)
            a = grow_i(par_ref[:], m_b)
            c0b = grow_i(c0_ref[:], m_b)
            c1b = grow_i(c1_ref[:], m_b)
            m_a = row_mask(a)
            c0a = grow_i(c0_ref[:], m_a)
            c1a = grow_i(c1_ref[:], m_a)
            c = jnp.where(c0a == b, c1a, c0a)
            m_c = row_mask(c)

            inds_c = gather_lanes(inds_ref, m_c)
            inds0 = gather_lanes(inds_ref, row_mask(c0b))
            inds1 = gather_lanes(inds_ref, row_mask(c1b))
            i0 = any_lanes(inds0 & inds_c)
            i1 = any_lanes(inds1 & inds_c)
            both = i0 & i1
            rand_bit = (rbits_i32() & 1) == 1
            # select_n on i1 operands hits an unsupported i8->i1 trunc in
            # this Mosaic; use logical algebra instead of jnp.where.
            pick_rand = cfg.disable_shared_inds | both
            take0 = (pick_rand & rand_bit) | (~pick_rand & i0)
            e = jnp.where(take0, c1b, c0b)
            m_e = row_mask(e)
            inds_d = jnp.where(take0, inds0, inds1)
            inds_e = jnp.where(take0, inds1, inds0)

            inds_a = gather_lanes(inds_ref, m_a)
            hyp_a = gather_lanes(hyper_ref, m_a)
            hyp_b = gather_lanes(hyper_ref, m_b)
            new_inds_b = (inds_d ^ inds_c) | hyp_a | hyp_b

            l_a = grow_f(lcc_ref[:], m_a)
            l_b = grow_f(lcc_ref[:], m_b)
            ln_b = width(inds_d | inds_c)
            ln_a = width(new_inds_b | inds_e)

            mx = jnp.maximum(lt, jnp.maximum(ln_a, ln_b))
            s = (jnp.exp2(lt - mx) - jnp.exp2(l_a - mx) -
                 jnp.exp2(l_b - mx) + jnp.exp2(ln_a - mx) +
                 jnp.exp2(ln_b - mx))
            l_new = mx + jnp.log2(jnp.maximum(s, 2.0**-60))

            u = runif()
            if cfg.prob_kind == 'mh':
                acc = jnp.log2(jnp.maximum(u, 2.0**-33)) <= \
                    -beta * (l_new - lt)
            elif cfg.prob_kind == 'greedy':
                acc = l_new <= lt
            else:
                acc = jnp.ones_like(l_new, dtype=bool)
            accept = walking & acc

            c_b = jnp.broadcast_to(c, (n, bk))
            e_b = jnp.broadcast_to(e, (n, bk))
            acc_n = jnp.broadcast_to(accept, (n, bk))
            upd = acc_n & (m_a | m_b)
            c0v = c0_ref[:]
            c1v = c1_ref[:]
            c0_ref[:] = jnp.where(upd & (c0v == c_b), e_b,
                                  jnp.where(upd & (c0v == e_b), c_b, c0v))
            c1_ref[:] = jnp.where(upd & (c1v == c_b), e_b,
                                  jnp.where(upd & (c1v == e_b), c_b, c1v))
            parv = par_ref[:]
            par_ref[:] = jnp.where(
                acc_n & m_c, jnp.broadcast_to(b, (n, bk)),
                jnp.where(acc_n & m_e, jnp.broadcast_to(a, (n, bk)),
                          parv))

            accw = jnp.broadcast_to(accept[:, None, :], (n, w, bk))
            indsv = inds_ref[:].reshape(n, w, bk)
            inds_ref[:] = jnp.where(
                accw & m_b[:, None, :],
                jnp.broadcast_to(new_inds_b[None], (n, w, bk)),
                indsv).reshape(n * w, bk)
            hyperv = hyper_ref[:].reshape(n, w, bk)
            hyperv = jnp.where(
                accw & m_a[:, None, :],
                jnp.broadcast_to((inds_a & new_inds_b & inds_e)[None],
                                 (n, w, bk)), hyperv)
            hyper_ref[:] = jnp.where(
                accw & m_b[:, None, :],
                jnp.broadcast_to((new_inds_b & inds_d & inds_c)[None],
                                 (n, w, bk)), hyperv).reshape(n * w, bk)
            lccv = lcc_ref[:]
            lcc_ref[:] = jnp.where(
                acc_n & m_a, jnp.broadcast_to(ln_a, (n, bk)),
                jnp.where(acc_n & m_b, jnp.broadcast_to(ln_b, (n, bk)),
                          lccv))

            pos_ref[:] = jnp.where(walking, a, pos_b)
            moves_ref[:] = moves_ref[:] + walking.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, n_iters, step, 0)

        # Final min compare for lanes idling at the root
        lt = log2_total()
        pos_b = pos_ref[:]
        par_pos = grow_i(par_ref[:], row_mask(pos_b))
        at_root = (pos_b == NULL) | (par_pos == NULL)
        improved = at_root & (lt < minlt_ref[:])
        minlt_ref[:] = jnp.where(improved, lt, minlt_ref[:])
        imp_n = jnp.broadcast_to(improved, (n, bk))
        minc0_ref[:] = jnp.where(imp_n, c0_ref[:], minc0_ref[:])
        minc1_ref[:] = jnp.where(imp_n, c1_ref[:], minc1_ref[:])
        minpar_ref[:] = jnp.where(imp_n, par_ref[:], minpar_ref[:])
        imp_w = jnp.broadcast_to(improved[:, None, :], (n, w, bk))
        mininds_ref[:] = jnp.where(
            imp_w, inds_ref[:].reshape(n, w, bk),
            mininds_ref[:].reshape(n, w, bk)).reshape(n * w, bk)

    return kernel


@fts.partial(jax.jit,
             static_argnames=('cfg', 'n_iters', 'block_b', 'interpret'))
def _run(batch: SABatch, betas, pos_b, sweep_cnt, seed2, log2d_col,
         cfg: SweepConfig, n_iters: int, block_b: int, interpret: bool):
    n, b = batch.c0.shape
    w = batch.inds.shape[1]
    n_blocks = b // block_b
    n_sweeps = betas.shape[0]

    kernel = _make_kernel(cfg, n, w, block_b, n_iters, n_sweeps)

    inds2 = batch.inds.reshape(n * w, b)
    hyper2 = batch.hyper.reshape(n * w, b)
    mininds2 = batch.min_inds.reshape(n * w, b)

    def spec(nrows):
        return pl.BlockSpec((nrows, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_in = [batch.c0, batch.c1, batch.par, inds2, hyper2, batch.lcc,
                batch.min_log2_total.reshape(1, b), batch.min_c0,
                batch.min_c1, batch.min_par, mininds2,
                pos_b.reshape(1, b), sweep_cnt.reshape(1, b)]
    state_specs = [spec(n), spec(n), spec(n), spec(n * w), spec(n * w),
                   spec(n), spec(1), spec(n), spec(n), spec(n),
                   spec(n * w), spec(1), spec(1)]

    out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in state_in] +
                  [jax.ShapeDtypeStruct((1, b), jnp.int32)])
    out_specs = state_specs + [spec(1)]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # betas [K, 1]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # log2d [w*32, 1]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [2]
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(state_in)

    aliases = {i + 3: i for i in range(len(state_in))}

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        interpret=(pltpu.InterpretParams(random_seed=1234)
                   if interpret else False),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(betas.reshape(n_sweeps, 1), log2d_col, seed2, *state_in)

    (c0, c1, par, inds2o, hyper2o, lcc, minlt, minc0, minc1, minpar,
     mininds2o, pos_o, cnt_o, moves) = outs
    out = SABatch(c0, c1, par, inds2o.reshape(n, w, b),
                  hyper2o.reshape(n, w, b), lcc, batch.log2_total,
                  minlt.reshape(b), minc0, minc1, minpar,
                  mininds2o.reshape(n, w, b), batch.keys)
    return out, {'moves': moves.reshape(b), 'pos_b': pos_o.reshape(b),
                 'sweep_cnt': cnt_o.reshape(b)}


def _pad_rows(x, n_pad, fill):
    """Pads axis 0 of ``[N, ...]`` device arrays with ``fill``."""
    if n_pad == 0:
        return x
    pad = jnp.full((n_pad,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def run_stream_pallas(batch: SABatch, betas, n_iters: int, cfg: SweepConfig,
                      log2_dims_padded, *, pos_b=None, sweep_cnt=None,
                      chunk_seed: int = 0, block_b: int = 256,
                      interpret: bool = False):
    """Runs ``n_iters`` streaming iterations on every replica block.

    Initial ``pos_b=None`` starts every lane at a sweep boundary.  Pass the
    returned ``pos_b``/``sweep_cnt`` (and a fresh ``chunk_seed``) to
    continue a run across chunks.  Dense cost model only.
    """
    n, b = batch.c0.shape
    w = batch.inds.shape[1]
    if b % block_b:
        raise ValueError(f"Replica count {b} not a multiple of {block_b}.")
    betas = jnp.asarray(betas, jnp.float32)
    if pos_b is None:
        pos_b = jnp.full(b, NULL, jnp.int32)
    if sweep_cnt is None:
        sweep_cnt = jnp.zeros(b, jnp.int32)
    seed2 = jnp.asarray(
        [int(batch.keys[0, 1]) & 0x7FFFFFFF, int(chunk_seed)], jnp.int32)
    log2d_col = jnp.asarray(log2_dims_padded,
                            jnp.float32).reshape(w * 32, 1)

    # Mosaic DMA slices need tile-aligned row counts: pad the node axis to
    # a multiple of 8.  Pad rows are inert (node ids < n never select
    # them; padded lcc of -inf contributes nothing to the total).
    n8 = -(-n // 8) * 8
    p = n8 - n
    padded = SABatch(
        _pad_rows(batch.c0, p, NULL), _pad_rows(batch.c1, p, NULL),
        _pad_rows(batch.par, p, NULL), _pad_rows(batch.inds, p, 0),
        _pad_rows(batch.hyper, p, 0), _pad_rows(batch.lcc, p, -jnp.inf),
        batch.log2_total, batch.min_log2_total,
        _pad_rows(batch.min_c0, p, NULL), _pad_rows(batch.min_c1, p, NULL),
        _pad_rows(batch.min_par, p, NULL), _pad_rows(batch.min_inds, p, 0),
        batch.keys) if p else batch

    out, metrics = _run(padded, betas, jnp.asarray(pos_b, jnp.int32),
                        jnp.asarray(sweep_cnt, jnp.int32), seed2,
                        log2d_col, cfg, int(n_iters), int(block_b),
                        bool(interpret))
    if p:
        out = SABatch(out.c0[:n], out.c1[:n], out.par[:n], out.inds[:n],
                      out.hyper[:n], out.lcc[:n], out.log2_total,
                      out.min_log2_total, out.min_c0[:n], out.min_c1[:n],
                      out.min_par[:n], out.min_inds[:n], out.keys)
    return out, metrics
