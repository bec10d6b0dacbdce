"""High-level optimization walkthrough (the reference Optimization.ipynb).

Run: python examples/optimization.py
"""

from tnco_tpu.app import load_tn, Optimizer

# A 4x4 square-lattice tensor network in the index-map format:
# each row is (bond dimension, tensor, tensor).
rows = []
for r in range(4):
    for c in range(4):
        if c + 1 < 4:
            rows.append((2, f't{r}{c}', f't{r}{c + 1}'))
        if r + 1 < 4:
            rows.append((2, f't{r}{c}', f't{r + 1}{c}'))

# Inspect the loaded network
tn = load_tn(rows, fuse=False)
print(f'{tn}: dims {dict(list(tn.dims.items())[:3])}...')

# Unconstrained (infinite-memory) simulated annealing:
# 64 replicas annealed over a linear beta ramp, all on one device batch.
opt = Optimizer(method='sa', seed=42)
tn, results = opt.optimize(rows, betas=(0, 50), n_steps=200, n_runs=64,
                           fuse=False)
best = results[0]
print(f'best cost: {best.cost} ops '
      f'(path of {len(best.path)} contractions)')

# Memory-constrained: no intermediate tensor wider than 2^3 after slicing.
opt = Optimizer(method='sa', max_width=3.0, seed=42)
tn, results = opt.optimize(rows, betas=(0, 50), n_steps=200, n_runs=64,
                           update_slices=10, fuse=False)
best = results[0]
print(f'width-capped best cost: {best.cost} ops, '
      f'sliced indices: {sorted(best.slices)}')

# Engine selection: 'multiwalk' runs 8 concurrent walks per replica —
# the highest-throughput device engine (betas are then per proposal
# iteration rather than per sweep; see docs/DESIGN.md).
opt = Optimizer(method='sa', seed=42, engine='multiwalk')
tn, results = opt.optimize(rows, betas=(0, 50), n_steps=400, n_runs=64,
                           fuse=False)
print(f'multiwalk best cost: {results[0].cost} ops')

# 'walks' is the chained multi-walk engine on the pull/gather layout —
# the large-network production engine (per-iteration cost independent
# of n_walks; bit-identical trajectories to 'multiwalk').
opt = Optimizer(method='sa', seed=42, engine='walks', n_walks=8)
tn, results = opt.optimize(rows, betas=(0, 50), n_steps=400, n_runs=64,
                           fuse=False)
print(f'walks best cost: {results[0].cost} ops')
