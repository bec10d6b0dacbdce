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

import hashlib
from random import Random

import jax
import pytest

jax.config.update('jax_platforms', 'cpu')

# Fixed default for reproducible CI; export PYTEST_SEED to fuzz.  (The
# engine-equality tests compare f32 trajectories across different XLA
# reduction layouts; a borderline Metropolis accept can legitimately flip
# for ~1 in 10^4 moves, so unseeded runs would rarely flake.)
_SEED = os.environ.get('PYTEST_SEED', '20260816')


def pytest_generate_tests(metafunc):
    """Randomized-test fuzzing knob (reference PYTEST_MAX_REPEAT,
    tests/test_core.py:54-63): repeat every seeded test N times; each
    repetition gets a fresh nodeid and hence a fresh hash-derived seed."""
    n = int(os.environ.get('PYTEST_MAX_REPEAT', '0') or 0)
    if n > 1 and 'random_seed' in metafunc.fixturenames:
        metafunc.parametrize('_repeat', range(n), indirect=True)


@pytest.fixture
def _repeat(request):
    return getattr(request, 'param', 0)


@pytest.fixture
def random_seed(request, _repeat) -> int:
    """Deterministic per-test seed derived from PYTEST_SEED + nodeid.

    Hash-derived (not drawn from a shared stream) so adding or reordering
    tests never shifts another test's seed — a seed that passes keeps
    passing regardless of which test subset runs.
    """
    digest = hashlib.sha256(
        f'{_SEED}:{request.node.nodeid}'.encode()).digest()
    return int.from_bytes(digest[:4], 'little') % 2**31


@pytest.fixture
def rng(random_seed) -> Random:
    return Random(random_seed)
