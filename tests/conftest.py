"""Test config: force CPU with an 8-device virtual mesh, seeded RNG fixture.

Mirrors the reference's randomized-property-test harness
(tests/test_core.py:50-63): a module-level RNG seeded by ``PYTEST_SEED``
drives per-test ``random_seed`` fixtures for reproducible fuzzing.
"""

import os

# Must run before any jax backend is initialized.  The image's sitecustomize
# pre-registers the remote 'axon' TPU backend and pins JAX_PLATFORMS=axon, so
# overriding the env var alone is not enough — use the config API too.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

from random import Random

import jax
import pytest

jax.config.update('jax_platforms', 'cpu')

_SEED = os.environ.get('PYTEST_SEED')
_RNG = Random(None if _SEED is None else int(_SEED))


@pytest.fixture
def random_seed() -> int:
    """Fresh deterministic seed per test invocation."""
    return _RNG.randrange(2**31)


@pytest.fixture
def rng(random_seed) -> Random:
    return Random(random_seed)
