"""Build and load the ACTUAL reference (google-research/tnco) in-image.

The image has no boost, no pybind11 package, no MPFR and zero network
egress, so the reference's own build (CMake + scikit-build-core,
/root/reference/CMakeLists.txt:16-55) cannot run as-is.  This module
closes the gap with in-image substitutes:

- pybind11 headers: vendored inside torch
  (``site-packages/torch/include/pybind11``).
- boost::dynamic_bitset: shimmed onto libstdc++'s
  ``std::tr2::dynamic_bitset`` (same API family) by
  ``shim/boost/dynamic_bitset.hpp`` — only ``intersects`` and the
  (GCC-12-broken) ``is_subset_of``/``is_proper_subset_of`` are
  reimplemented there on top of the public API.
- MPFR: skipped via the reference's own ``SKIP_MPFR`` escape hatch
  (/root/reference/scripts/mpfr.cmake), dropping only float1024 —
  float64 costs are ample for the benchmark configs (log2 cost < 300).
- autoray (absent): stubbed with a numpy-dispatching module good enough
  to *import* tnco.utils.tensor; the optimizer path never calls it.

The compiled module and the reference package are loaded side by side
with this repo's package so the quality protocol can run a true
differential baseline (VERDICT round 1, "Next round" item 4).
"""

import os
import subprocess
import sys
import sysconfig

REFERENCE = os.environ.get('TNCO_REFERENCE_DIR', '/root/reference')
BUILD_DIR = os.environ.get(
    'TNCO_REFBUILD_DIR',
    os.path.join(os.path.dirname(os.path.abspath(__file__)), '_build'))
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'shim')


def _pybind11_include() -> str:
    import torch
    return os.path.join(os.path.dirname(torch.__file__), 'include')


def module_path() -> str:
    suffix = sysconfig.get_config_var('EXT_SUFFIX')
    return os.path.join(BUILD_DIR, f'tnco_core{suffix}')


def build(force: bool = False, debug: bool = False) -> str:
    """Compile the reference tnco_core extension; returns the .so path."""
    out = module_path()
    src = os.path.join(REFERENCE, 'include', 'tnco', 'main.cpp')
    if os.path.exists(out) and not force:
        return out
    os.makedirs(BUILD_DIR, exist_ok=True)
    py_include = sysconfig.get_paths()['include']
    cmd = [
        'g++', '-std=c++17', '-shared', '-fPIC',
        '-O3', *([] if debug else ['-DNDEBUG']),
        '-DSKIP_MPFR=1',
        src,
        f'-I{os.path.join(REFERENCE, "include")}',
        f'-I{_SHIM}',
        f'-I{_pybind11_include()}',
        f'-I{py_include}',
        '-o', out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def _install_autoray_stub() -> None:
    if 'autoray' in sys.modules:
        return
    import types

    import numpy as _np

    ar = types.ModuleType('autoray')

    def do(fn, *args, like=None, **kwargs):
        f = _np
        for part in str(fn).split('.'):
            f = getattr(f, part)
        return f(*args, **kwargs)

    ar.do = do
    ar.to_numpy = _np.asarray
    ar.infer_backend = lambda x: 'numpy'
    ar.register_function = lambda *a, **k: (lambda f: f)
    sys.modules['autoray'] = ar


def load():
    """Build if needed, put reference on sys.path, return the tnco pkg."""
    build()
    if BUILD_DIR not in sys.path:
        sys.path.insert(0, BUILD_DIR)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _install_autoray_stub()
    import tnco  # noqa: F401  (the reference package)
    import tnco_core  # noqa: F401
    if not tnco.__file__.startswith(REFERENCE):
        raise ImportError(
            f'loaded tnco from {tnco.__file__}, expected {REFERENCE}')
    return tnco


def available() -> bool:
    """True if the reference can be (or has been) built in this image."""
    try:
        build()
        return True
    except Exception:
        return False
