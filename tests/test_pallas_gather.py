"""pallas_gather: interpret-mode kernel == XLA lowering, all dtypes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tnco_tpu.kernels import pallas_gather as pg


@pytest.mark.parametrize('dtype', ['int32', 'uint32', 'float32'])
def test_gather_matches_xla(random_seed, dtype):
    r = np.random.default_rng(random_seed)
    g, b, n = int(r.integers(1, 4)), int(r.integers(3, 20)), \
        int(r.integers(5, 400))
    q = int(r.integers(1, 700))
    if dtype == 'float32':
        vals = r.standard_normal((g, b, n)).astype(np.float32)
    else:
        vals = r.integers(0, 2**31, (g, b, n)).astype(dtype)
    # ids include NULL (-1) and out-of-range rows
    ids = r.integers(-2, n + 3, (b, q)).astype(np.int32)

    ref = pg._gather_xla(jnp.asarray(vals), jnp.asarray(ids))
    got = pg.gather_gbn(jnp.asarray(vals), jnp.asarray(ids),
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # default off-TPU path is the XLA lowering
    auto = pg.gather_gbn(jnp.asarray(vals), jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))


def test_gather_bn_wrapper(random_seed):
    r = np.random.default_rng(random_seed + 1)
    b, n, q = 7, 130, 260
    vals = r.integers(0, 2**31, (b, n)).astype(np.int32)
    ids = r.integers(-1, n, (b, q)).astype(np.int32)
    got = pg.gather_bn(jnp.asarray(vals), jnp.asarray(ids),
                       interpret=True)
    ref = pg._gather_xla(jnp.asarray(vals)[None], jnp.asarray(ids))[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_gather_supported_budget():
    assert pg.gather_supported(256, 3328)
    assert not pg.gather_supported(8192, 65536)
