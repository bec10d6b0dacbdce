"""Runs every docstring example in the package (reference CI parity:
run_tests.yml:71-74 runs ``pytest --doctest-modules tnco/``)."""

import doctest
import importlib
import pkgutil

import pytest

import tnco_tpu


def _modules():
    for info in pkgutil.walk_packages(tnco_tpu.__path__,
                                      prefix='tnco_tpu.'):
        yield info.name


@pytest.mark.parametrize('name', sorted(_modules()))
def test_doctests(name):
    try:
        module = importlib.import_module(name)
    except ImportError as exc:  # optional third-party integrations
        pytest.skip(f'import failed: {exc}')
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f'{results.failed} doctest failures in {name}'
