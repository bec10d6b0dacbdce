"""Pallas TPU SA kernel: VMEM-resident replica blocks.

The XLA batched engine (:mod:`tnco_tpu.kernels.sa_batched`) re-reads and
re-writes the whole replica state from HBM on every walk step.  This kernel
keeps the entire state of a replica block in VMEM for a whole chunk of
sweeps — HBM is touched once per chunk — turning the sweep into pure VPU
work with the same masked-dense formulation:

- grid = replica blocks (``block_b`` lanes each), state blocks in VMEM via
  ``input_output_aliases`` (in-place update);
- per-lane scalars are ``[1, B]`` row vectors, per-node state ``[N, B]`` /
  ``[N*W, B]`` with replicas on the 128-wide lane axis;
- RNG: the TPU core PRNG (``pltpu.prng_*``), seeded per block — streams are
  deterministic per (seed, block) but differ from the threefry streams of
  the reference engines.

VMEM budget is ~``10 * N * W * block_b * 4`` bytes; the caller should fall
back to the XLA engine when that exceeds a few MB.

STATUS: experimental, DISABLED by default.  Two independent Mosaic issues
observed on this toolchain (jax 0.9.0 / remote Mosaic compile):

1. ``lax.while_loop`` with vector carries fails to legalize
   (``scf.yield``);
2. with scalar carries + vector state in VMEM scratch refs, the kernel
   compiles but the in-loop ref *reads* appear to be hoisted as
   loop-invariant — the loop never observes its own writes and spins
   forever, wedging the whole chip (requires a device reset).

Until the toolchain is fixed, calling :func:`run_sweeps_pallas` on a real
TPU requires ``TNCO_TPU_ENABLE_PALLAS=1``; interpret mode is always
allowed.  The XLA lane-major engine in ``sa_batched`` is the production
path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnco_tpu.kernels.sa_batched import SABatch
from tnco_tpu.kernels.sa_infinite import SweepConfig

__all__ = ['run_sweeps_pallas', 'pallas_vmem_bytes']

NULL = -1
_INV_U32 = np.float32(1.0 / 4294967296.0)  # 2**-32


def pallas_vmem_bytes(n: int, w: int, block_b: int) -> int:
    """Approximate VMEM bytes needed per replica block."""
    per_node = (3 + 1 + 3) * 4          # c0,c1,par,lcc + min copies
    per_lane_row = 3 * w * 4            # inds, hyper, min_inds
    return n * block_b * (per_node + per_lane_row) + 64 * 1024


def _make_kernel(cfg: SweepConfig, n: int, w: int, block_b: int,
                 n_sweeps: int, dtype):
    n_leaves = cfg.n_leaves
    bk = block_b

    def kernel(betas_ref, log2d_ref, seed_ref, c0_in, c1_in, par_in,
               inds_in, hyper_in, lcc_in, minlt_in, minc0_in, minc1_in,
               minpar_in, mininds_in,
               c0_ref, c1_ref, par_ref, inds_ref, hyper_ref, lcc_ref,
               minlt_ref, minc0_ref, minc1_ref, minpar_ref, mininds_ref,
               moves_ref):
        del (c0_in, c1_in, par_in, inds_in, hyper_in, lcc_in, minlt_in,
             minc0_in, minc1_in, minpar_in, mininds_in)  # aliased to outs

        block = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], block)

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, bk), 0)
        # log2 dim per bit column, layout [W*32] replicated over lanes
        log2d = log2d_ref[:]  # [w*32, 1]

        def rbits_i32():
            # int32 view of random bits (Mosaic lacks u32->f32 casts)
            return jax.lax.bitcast_convert_type(
                pltpu.prng_random_bits((1, bk)), jnp.int32)

        def runif():
            # 24-bit mantissa uniform in [0, 1)
            return ((rbits_i32() & 0xFFFFFF).astype(jnp.float32) *
                    np.float32(2.0**-24))

        def row_mask(pos):
            return iota_n == pos  # pos [1,bk] -> [n,bk]

        def grow_i(arr, mask):
            return jnp.sum(jnp.where(mask, arr, 0), axis=0,
                           keepdims=True)

        def grow_f(arr, mask):
            return jnp.sum(jnp.where(mask, arr, 0.0), axis=0,
                           keepdims=True)

        def gather_lanes(ref, mask):
            # ref: [n*w, bk] uint32; mask [n, bk] -> out [w, bk].
            # Mosaic lacks unsigned reductions: sum through an int32
            # bitcast (exactly one row is nonzero, so the sum is exact).
            arr = ref[:].reshape(n, w, bk)
            sel = jnp.where(mask[:, None, :], arr, jnp.uint32(0))
            sel_i = jax.lax.bitcast_convert_type(sel, jnp.int32)
            return jax.lax.bitcast_convert_type(
                jnp.sum(sel_i, axis=0), jnp.uint32)  # [w, bk]

        shifts = jax.lax.broadcasted_iota(jnp.uint32, (w, 32, 1), 1)

        def width(lanes_wb):
            bits01 = jax.lax.bitcast_convert_type(
                (lanes_wb[:, None, :] >> shifts) & jnp.uint32(1),
                jnp.int32)
            bits = bits01.astype(dtype)  # [w,32,bk]
            return jnp.sum(bits * log2d.reshape(w, 32, 1), axis=(0, 1),
                           keepdims=False).reshape(1, bk)

        def log2_total():
            internal = lcc_ref[n_leaves:, :]
            m = jnp.max(internal, axis=0, keepdims=True)
            s = jnp.sum(jnp.exp2(internal - m), axis=0, keepdims=True)
            return m + jnp.log2(s)

        def sweep(k, _):
            beta = betas_ref[k]
            leaf = (rbits_i32() & 0x7FFFFFFF) % jnp.int32(n_leaves)
            m_leaf = row_mask(leaf)
            pos_b0 = grow_i(par_ref[:], m_leaf)
            lt0 = log2_total()

            par_b0 = grow_i(par_ref[:], row_mask(pos_b0))
            active0 = (pos_b0 != NULL) & (par_b0 != NULL)

            def cond(carry):
                return jnp.any(carry[2])

            def body(carry):
                pos_b, lt, active, moves = carry

                b = pos_b
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
                i0 = jnp.any(inds0 & inds_c, axis=0, keepdims=True)
                i1 = jnp.any(inds1 & inds_c, axis=0, keepdims=True)
                both = i0 & i1
                rand_bit = (rbits_i32() & 1) == 1
                take0 = jnp.where(cfg.disable_shared_inds | both,
                                  rand_bit, i0)
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
                accept = active & acc

                # Apply updates in place (masked rows)
                c_b = jnp.broadcast_to(c, (n, bk))
                e_b = jnp.broadcast_to(e, (n, bk))
                acc_n = jnp.broadcast_to(accept, (n, bk))
                upd = acc_n & (m_a | m_b)
                c0v = c0_ref[:]
                c1v = c1_ref[:]
                c0_ref[:] = jnp.where(upd & (c0v == c_b), e_b,
                                      jnp.where(upd & (c0v == e_b), c_b,
                                                c0v))
                c1_ref[:] = jnp.where(upd & (c1v == c_b), e_b,
                                      jnp.where(upd & (c1v == e_b), c_b,
                                                c1v))
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
                                     (n, w, bk)), hyperv).reshape(
                        n * w, bk)
                lccv = lcc_ref[:]
                lcc_ref[:] = jnp.where(
                    acc_n & m_a, jnp.broadcast_to(ln_a, (n, bk)),
                    jnp.where(acc_n & m_b, jnp.broadcast_to(ln_b, (n, bk)),
                              lccv))
                lt = jnp.where(accept, l_new, lt)

                pos_b = jnp.where(active, a, pos_b)
                moves = moves + active.astype(jnp.int32)
                par_next = grow_i(par_ref[:], row_mask(pos_b))
                next_active = active & (pos_b != NULL) & (par_next != NULL)
                return pos_b, lt, next_active, moves

            _, _, _, moves = jax.lax.while_loop(
                cond, body,
                (pos_b0, lt0, active0, jnp.zeros((1, bk), jnp.int32)))
            moves_ref[:] = moves_ref[:] + moves

            # Min snapshot
            lt_final = log2_total()
            improved = lt_final < minlt_ref[:]
            minlt_ref[:] = jnp.where(improved, lt_final, minlt_ref[:])
            imp_n = jnp.broadcast_to(improved, (n, bk))
            minc0_ref[:] = jnp.where(imp_n, c0_ref[:], minc0_ref[:])
            minc1_ref[:] = jnp.where(imp_n, c1_ref[:], minc1_ref[:])
            minpar_ref[:] = jnp.where(imp_n, par_ref[:], minpar_ref[:])
            imp_w = jnp.broadcast_to(improved[:, None, :], (n, w, bk))
            mininds_ref[:] = jnp.where(
                imp_w, inds_ref[:].reshape(n, w, bk),
                mininds_ref[:].reshape(n, w, bk)).reshape(n * w, bk)
            return 0

        moves_ref[:] = jnp.zeros((1, bk), jnp.int32)
        jax.lax.fori_loop(0, n_sweeps, sweep, 0)

    return kernel


def run_sweeps_pallas(batch: SABatch, betas, log2_dims_padded,
                      cfg: SweepConfig, *, block_b: int = 256,
                      interpret: bool = False):
    """Runs ``len(betas)`` sweeps with the VMEM-resident Pallas kernel.

    ``batch`` must have the replica axis a multiple of ``block_b``.
    Sparse cost models are not supported here (use the XLA engine).
    Returns ``(new_batch, metrics)`` with per-block move counts.
    """
    if not interpret and not os.environ.get('TNCO_TPU_ENABLE_PALLAS'):
        raise RuntimeError(
            "The Pallas SA kernel is disabled on real TPUs: the current "
            "Mosaic toolchain miscompiles its stateful loops into an "
            "infinite on-device spin (see module docstring). Set "
            "TNCO_TPU_ENABLE_PALLAS=1 to try anyway, or use "
            "interpret=True.")
    n, b = batch.c0.shape
    w = batch.inds.shape[1]
    if b % block_b:
        raise ValueError(f"Replica count {b} not a multiple of "
                         f"{block_b}.")
    n_blocks = b // block_b
    n_sweeps = len(betas)
    dtype = batch.lcc.dtype

    kernel = _make_kernel(cfg, n, w, block_b, n_sweeps, dtype)

    # Base seed (mixed with the block id inside the kernel)
    seeds = jnp.asarray(batch.keys[0, 1], dtype=jnp.int32).reshape(1)

    inds2 = batch.inds.reshape(n * w, b)
    mininds2 = batch.min_inds.reshape(n * w, b)
    log2d_col = jnp.asarray(log2_dims_padded,
                            dtype=dtype).reshape(w * 32, 1)

    def spec(nrows):
        return pl.BlockSpec((nrows, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_in = [batch.c0, batch.c1, batch.par, inds2, batch.hyper.reshape(
        n * w, b), batch.lcc, batch.min_log2_total.reshape(1, b),
        batch.min_c0, batch.min_c1, batch.min_par, mininds2]
    state_specs = [spec(n), spec(n), spec(n), spec(n * w), spec(n * w),
                   spec(n), spec(1), spec(n), spec(n), spec(n),
                   spec(n * w)]

    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in state_in] + [
        jax.ShapeDtypeStruct((1, b), jnp.int32)]
    out_specs = state_specs + [spec(1)]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # betas
        pl.BlockSpec(memory_space=pltpu.VMEM),  # log2d
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
    ] + state_specs

    aliases = {i + 3: i for i in range(len(state_in))}

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=(pltpu.InterpretParams(random_seed=1234)
                   if interpret else False),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(betas, jnp.float32), log2d_col, seeds, *state_in)

    (c0, c1, par, inds2o, hyper2o, lcc, minlt, minc0, minc1, minpar,
     mininds2o, moves) = outs

    out = SABatch(c0, c1, par, inds2o.reshape(n, w, b),
                  hyper2o.reshape(n, w, b), lcc, batch.log2_total,
                  minlt.reshape(b), minc0, minc1, minpar,
                  mininds2o.reshape(n, w, b), batch.keys)
    return out, {'moves': moves}
