"""Low-level core API walkthrough (the reference BaseOptimization.ipynb).

Run: python examples/base_optimization.py
"""

from tnco_tpu.ctree import ContractionTree, get_contraction
from tnco_tpu.optimize.finite_width import (
    Optimizer as FWOptimizer, SimpleCostModel as FWCostModel)
from tnco_tpu.optimize.infinite_memory import Optimizer, SimpleCostModel
from tnco_tpu.optimize.prob import MetropolisHastings

# Build a contraction tree directly from an einsum path
path = [(0, 1), (0, 1), (0, 1)]
ts_inds = [['i', 'j'], ['j', 'k'], ['k', 'l'], ['l', 'm']]
dims = {'i': 2, 'j': 4, 'k': 8, 'l': 4, 'm': 2}
ctree = ContractionTree(path, ts_inds, dims, check_shared_inds=True)
print(ctree, '| max width:', ctree.max_width(),
      '| exact cost:', ctree.total_cost_exact())

# Anneal with the infinite-memory optimizer
opt = Optimizer(ctree, SimpleCostModel(), seed=7)
prob = MetropolisHastings()
for step in range(100):
    prob.beta = step  # linear ramp
    opt.update(prob)
print('min cost:', opt.min_total_cost,
      '| log2:', round(opt.log2_min_total_cost, 4))

# The optimized contraction order, back in einsum format
print('best path:', opt.min_ctree.path())
print('contractions:', get_contraction(opt.min_ctree))

# Width-capped variant: slices co-optimized with the tree
fw = FWOptimizer(ctree, FWCostModel(max_width=4.0), seed=7)
for step in range(100):
    prob.beta = step
    fw.update(prob, update_slices=(step % 10 == 0))
print('width-capped min cost:', fw.min_total_cost,
      '| slices:', sorted(fw.min_slices))

# Checkpoint/resume: pickling preserves the full PRNG stream
import pickle
clone = pickle.loads(pickle.dumps(opt))
assert clone == opt
print('pickle round-trip OK, prng_state:', opt.prng_state[:24], '...')
