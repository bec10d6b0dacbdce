"""Replica-batch runtime: the TPU-native replacement for process fan-out.

The reference runs ``n_runs`` independent SA chains in loky processes with
SharedMemory status/stop buffers (tnco/parallel.py:111-368).  Here replicas
are a vmapped device batch — thousands per chip — sharded over a
``jax.sharding.Mesh`` when more devices are available, with chunked
annealing for wall-clock budgeting and host-visible live metrics.
"""

from tnco_tpu.parallel.host import Buffer, Parallel
from tnco_tpu.parallel.replicas import (make_mesh, ReplicaRunner,
                                        replica_sharding)

__all__ = ['ReplicaRunner', 'replica_sharding', 'make_mesh', 'Parallel',
           'Buffer']
