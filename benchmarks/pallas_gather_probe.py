"""Micro-probe: per-row cost of dynamic-sublane row gathers in Pallas.

The planned row-major walker engine (state as ``[N, 128]`` u32 rows in
VMEM, node id -> ``ref[pl.ds(id, 1), :]``) is gated on this number: a
walk iteration needs ~6 row reads + ~4 row writes per walk, so at
P=128 walks a block iteration spends ~1300 row ops.  This probe times a
tight fori loop of R rounds x P dynamic row reads + P row writes over a
Sycamore-sized [N=3328, 128] i32 state resident in VMEM, plus a
variant using jnp.take (vectorized sublane gather) if Mosaic accepts
it.

Usage::

    python -m benchmarks.pallas_gather_probe [P] [ROUNDS] [--interpret]
"""

import functools as fts
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _loop_kernel(ids_ref, state_in, out_ref, scratch, state_ref):
    p = ids_ref.shape[1]
    rounds = ids_ref.shape[0]
    state_ref[:] = state_in[:]

    def round_body(r, _):
        def body(i, _):
            idx = ids_ref[r, i]
            scratch[pl.ds(i, 1), :] = state_ref[pl.ds(idx, 1), :]
            return 0

        jax.lax.fori_loop(0, p, body, 0)

        # write P rows back to distinct rows (simulating the apply)
        def wbody(i, _):
            idx = ids_ref[r, i]
            state_ref[pl.ds(idx, 1), :] = scratch[pl.ds(i, 1), :] + 1
            return 0

        jax.lax.fori_loop(0, p, wbody, 0)
        return 0

    jax.lax.fori_loop(0, rounds, round_body, 0)
    out_ref[:] = scratch[:]


def _take_kernel(ids_ref, state_ref, out_ref):
    rounds = ids_ref.shape[0]

    def round_body(r, acc):
        rows = jnp.take(state_ref[:], ids_ref[pl.ds(r, 1), :][0], axis=0)
        return acc + rows

    acc = jnp.zeros(out_ref.shape, jnp.int32)
    out_ref[:] = jax.lax.fori_loop(0, rounds, round_body, acc)


@fts.partial(jax.jit, static_argnames=('impl', 'interpret'))
def probe(state, ids, impl: str, interpret: bool):
    n = state.shape[0]
    p = ids.shape[1]
    if impl == 'loop':
        return pl.pallas_call(
            _loop_kernel,
            out_shape=jax.ShapeDtypeStruct((p, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((p, 128), jnp.int32),
                            pltpu.VMEM((n, 128), jnp.int32)],
            interpret=interpret,
        )(ids, state)
    return pl.pallas_call(
        _take_kernel,
        out_shape=jax.ShapeDtypeStruct((p, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ids, state)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    interpret = '--interpret' in sys.argv
    p = int(args[0]) if args else 128
    rounds = int(args[1]) if len(args) > 1 else 256
    n = 3328
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.integers(0, 1 << 20, (n, 128)), jnp.int32)
    ids = jnp.asarray(rng.integers(0, n, (rounds, p)), jnp.int32)

    for impl in ('loop', 'take'):
        try:
            out = probe(state, ids, impl, interpret)
            out.block_until_ready()
            np.asarray(out)
            t0 = time.perf_counter()
            out = probe(state, ids, impl, interpret)
            np.asarray(out)
            dt = time.perf_counter() - t0
            nrows = rounds * p * (2 if impl == 'loop' else 1)
            print(f'{impl}: {dt*1e3:.2f} ms for {nrows} row ops '
                  f'-> {dt/nrows*1e9:.0f} ns/row')
        except Exception as exc:  # noqa: BLE001 - probe reports and moves on
            print(f'{impl}: FAILED {type(exc).__name__}: '
                  f'{str(exc).splitlines()[0][:200]}')


if __name__ == '__main__':
    main()
