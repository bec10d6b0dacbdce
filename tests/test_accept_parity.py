"""Acceptance-decision parity vs exact arithmetic (SURVEY §7 hard part).

The reference accepts in the LINEAR domain with 1024-bit floats
(include/tnco/optimize/infinite_memory/optimizer.hpp:150-162,
include/tnco/optimize/prob/mh.hpp:45-59); the rebuild accepts in the
f32/f64 log2 domain.  ``testing.accept_parity`` replays identical
proposal streams through both and computes the EXACT expected
borderline-flip probability per proposal (the measure of the u-interval
where the two rules disagree, in 60-digit Decimal).  These tests bound
the measured rates; docs/DESIGN.md records the 4-seed aggregates.
"""

from random import Random

import pytest

from tnco_tpu.ctree import ContractionTree
from tnco_tpu.testing.accept_parity import measure_flip_rate
from tnco_tpu.testing.utils import generate_random_tensors
from tnco_tpu.utils.tn import get_random_contraction_path


@pytest.fixture(scope='module')
def parity_result():
    rng = Random(0)
    ts_inds, output_inds, dims = generate_random_tensors(
        rng, n_tensors=16, n_output_inds=2, min_dim=2, max_dim=4)
    order = tuple(dict.fromkeys(x for xs in ts_inds for x in xs))
    paths = get_random_contraction_path(ts_inds, output_inds,
                                        merge_paths=False, seed=0)
    (path,) = [p for p in paths if p]
    ctree = ContractionTree(path, ts_inds, dims, output_inds=output_inds,
                            check_shared_inds=True, inds_order=order)
    return measure_flip_rate(ctree, n_states=4, n_u=2, seed=0)


def test_flip_rate_bounds(parity_result):
    """Expected borderline-flip probability per proposal: ~2e-6 at f32
    (totals rule), ~30x lower with the production delta_log2_local rule,
    and ~1e-9 at f64 (measured 4-seed aggregates in docs/DESIGN.md;
    bounds here are ~5x the measured maxima)."""
    res = parity_result
    assert res['total_float32']['expected_rate'] < 2e-5
    assert res['local_float32']['expected_rate'] < 2e-6
    assert res['total_float64']['expected_rate'] < 5e-8
    assert res['local_float64']['expected_rate'] < 5e-8
    # The local (log1p) rule is never worse than the totals rule at f32.
    assert (res['local_float32']['expected_rate'] <=
            res['total_float32']['expected_rate'])


def test_sampled_flips_consistent(parity_result):
    """With per-proposal flip probability ~2e-6, a few thousand sampled
    draws should essentially never flip."""
    res = parity_result
    for key in ('total_float32', 'local_float32',
                'total_float64', 'local_float64'):
        assert res[key]['flips'] <= 1, (key, res[key])
        assert res[key]['proposals'] > 300
