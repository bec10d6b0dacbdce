"""Persistent XLA compilation cache (VERDICT r4 item 4).

Large walk-engine programs on Sycamore shapes cost minutes of XLA/Mosaic
compile time per fresh process (round-4 measured ``tpu_setup_s``: 716 s
at P=32, 1574 s at P=128 — QUALITY_r4.jsonl rows 1/21), while the
reference starts optimizing in milliseconds
(/root/reference/tnco/app/infinite_memory/sa.py:166-234).  A persistent
on-disk cache makes every process after the first pay only the
deserialize cost.

Call :func:`enable` before the first compilation (any entry point that
expects to jit large programs: the CLI, the app optimizers, bench and
the quality drivers).  Resolution order for the cache directory:

1. explicit ``cache_dir`` argument,
2. ``TNCO_TPU_COMPILE_CACHE`` environment variable
   (``TNCO_TPU_COMPILE_CACHE=0`` disables the cache entirely),
3. ``JAX_COMPILATION_CACHE_DIR`` environment variable,
4. ``~/.cache/tnco_tpu/xla``.

Whether the cache actually serves a given backend is a PJRT-plugin
property (executables must be serializable); :func:`probe` measures it
empirically so protocol docs can state which setups were warm.
"""

import os

__all__ = ['enable', 'probe']

_DISABLED = ('0', 'off', 'none', 'disabled')


def enable(cache_dir: str | None = None,
           min_compile_time_secs: float = 2.0) -> str | None:
    """Points JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled.  Safe to call
    more than once and before/after ``import jax`` (config update, not
    env); must run before the first big jit to be useful.
    """
    resolved = (cache_dir
                or os.environ.get('TNCO_TPU_COMPILE_CACHE')
                or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                or os.path.join(os.path.expanduser('~'), '.cache',
                                'tnco_tpu', 'xla'))
    if str(resolved).lower() in _DISABLED:
        return None
    import jax

    os.makedirs(resolved, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', str(resolved))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      float(min_compile_time_secs))
    # Cache every entry above the time threshold regardless of size.
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    return str(resolved)


def probe() -> dict:
    """Compiles a token program and reports whether the backend's
    executables round-trip through the persistent cache (new cache file
    appears).  Cheap (~1 s program); meant for diagnostics, not hot
    paths."""
    import glob
    import time

    import jax
    import jax.numpy as jnp

    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return {'enabled': False}
    before = set(glob.glob(os.path.join(cache_dir, '*')))
    t0 = time.perf_counter()

    @jax.jit
    def token(x):
        # Enough structure to exceed the min-compile-time threshold on
        # most backends is NOT guaranteed; pair with min_compile_time 0
        # if an unconditional answer is needed.
        return jnp.tanh(x @ x.T).sum()

    token(jnp.ones((256, 256))).block_until_ready()
    return {
        'enabled': True,
        'cache_dir': cache_dir,
        'compile_s': time.perf_counter() - t0,
        'wrote_entry': bool(set(glob.glob(os.path.join(cache_dir, '*')))
                            - before),
    }
