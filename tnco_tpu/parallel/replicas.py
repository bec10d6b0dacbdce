"""Vmapped replica batches with mesh sharding and chunked annealing.

Design (SURVEY.md §2.3 mapping):

- ``n_runs`` loky processes            ->  leading replica axis, ``vmap``
- SharedMemory status/stop buffers     ->  per-chunk host callbacks + a
                                           cooperative wall-clock budget
- ``sorted(results)`` best-of-runs     ->  ``argmin`` over the (sharded)
                                           replica axis (an XLA all-reduce
                                           over ICI when meshed)
- per-run mt19937 seeds                ->  counter-based PRNG keys

Replicas of one connected component share array shapes (same leaves and
index count), so a batch is a single stacked pytree.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tnco_tpu.kernels import sa_batched as sb
from tnco_tpu.kernels import sa_finite as saf
from tnco_tpu.kernels import sa_finite_batched as sfb
from tnco_tpu.kernels import sa_infinite as sa
from tnco_tpu.ops import bitops

__all__ = ['ReplicaRunner', 'ReplicaRunnerFW', 'replica_sharding',
           'make_mesh']


def make_mesh(devices=None, axis_name: str = 'r', *, shape=None,
              axis_names=None):
    """Replica mesh over all (or the given) devices.

    1-D by default.  Pass ``shape``/``axis_names`` for an N-D mesh, e.g.
    ``make_mesh(shape=(2, 4), axis_names=('dcn', 'ici'))`` for a
    two-slice pod: the replica axis is sharded over *all* axes, while
    best-exchange collectives can be restricted to a subset (exchange
    over 'ici' frequently, over 'dcn' rarely — ICI bandwidth >> DCN).
    """
    devices = jax.devices() if devices is None else list(devices)
    if shape is None:
        return jax.sharding.Mesh(np.asarray(devices), (axis_name,))
    if axis_names is None:
        axis_names = tuple(f'ax{i}' for i in range(len(shape)))
    return jax.sharding.Mesh(
        np.asarray(devices).reshape(shape), tuple(axis_names))


# Engines whose device state is the lane-major SABatch/SABatchFW layout
# (replica axis LAST); 'vmapped' keeps replica-major pytrees instead.
# Lane-major engines share the exchange_best machinery too.
_LANE_MAJOR = ('batched', 'multiwalk', 'walker', 'sweep', 'walks')

# Engines with no multi-chip execution path: their Pallas (Mosaic)
# kernels run under plain jit, which GSPMD cannot partition over a
# mesh (see sa_walks.run_walks_sharded and
# pallas_walker.run_walker_sharded for the supported shard_map
# pattern).  The runners refuse a mesh for these instead of silently
# producing a program that fails (or worse, mispartitions) on pods.
_MESHLESS = ('sweep',)


def replica_sharding(mesh, axis_name=None):
    """NamedSharding that splits the replica axis over ALL mesh axes."""
    axis = tuple(mesh.axis_names) if axis_name is None else axis_name
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))


def _to_vmapped_fw(batch: 'sfb.SABatchFW') -> 'saf.SAStateFW':
    """Lane-major SABatchFW -> replica-major stacked SAStateFW pytree."""
    nodes = jnp.stack([batch.c0.T, batch.c1.T, batch.par.T], axis=2)
    min_nodes = jnp.stack(
        [batch.min_c0.T, batch.min_c1.T, batch.min_par.T], axis=2)
    return saf.SAStateFW(nodes, jnp.moveaxis(batch.inds, -1, 0),
                         jnp.moveaxis(batch.hyper, -1, 0), batch.lcc.T,
                         batch.width.T, batch.slices.T, batch.log2_total,
                         batch.min_log2_total, min_nodes,
                         jnp.moveaxis(batch.min_inds, -1, 0),
                         batch.min_slices.T, batch.keys)


def _to_vmapped(batch: 'sb.SABatch') -> 'sa.SAStateIM':
    """Lane-major SABatch -> replica-major stacked SAStateIM pytree."""
    nodes = jnp.stack([batch.c0.T, batch.c1.T, batch.par.T], axis=2)
    min_nodes = jnp.stack(
        [batch.min_c0.T, batch.min_c1.T, batch.min_par.T], axis=2)
    return sa.SAStateIM(nodes, jnp.moveaxis(batch.inds, -1, 0),
                        jnp.moveaxis(batch.hyper, -1, 0), batch.lcc.T,
                        batch.log2_total, batch.min_log2_total, min_nodes,
                        jnp.moveaxis(batch.min_inds, -1, 0), batch.keys)


def _shard_batch(batch: 'sb.SABatch', mesh) -> 'sb.SABatch':
    """Shards a lane-major ``SABatch`` over the mesh's first axis.

    Every leaf carries the replica axis last except ``keys`` ([B, 2]).
    """
    axis = tuple(mesh.axis_names)

    def put(x, replica_axis):
        spec = [None] * x.ndim
        spec[replica_axis] = axis
        return jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(*spec)))

    return sb.SABatch(
        put(batch.c0, -1), put(batch.c1, -1), put(batch.par, -1),
        put(batch.inds, -1), put(batch.hyper, -1), put(batch.lcc, -1),
        put(batch.log2_total, -1), put(batch.min_log2_total, -1),
        put(batch.min_c0, -1), put(batch.min_c1, -1),
        put(batch.min_par, -1), put(batch.min_inds, -1),
        put(batch.keys, 0))



def _accel_available() -> bool:
    """True when the default JAX backend is an accelerator.

    The 'auto' engine routes large networks to the device walk engines
    only when one is actually present; on CPU-only hosts (tests, plain
    shells) large networks keep the native C++ engine.  Monkeypatchable
    (tests pin the routing without a TPU).
    """
    try:
        return jax.devices()[0].platform != 'cpu'
    except Exception:
        return False


def _resolve_walks(engine: str, n_walks, fw: bool = False) -> int:
    """Per-engine default walk count (the defended operating points,
    docs/QUALITY.md: walker IM at P=8; walks FW at P=128 — the round-4
    repeated-cell matrix shows P=128 per-seed medians beat both the
    P=32 medians and the CPU arm on the seeds where P=32 loses, at
    4.3x the proposal rate.  walks IM keeps P=32: the round-5 P=128
    probe reads 4.0e6 proposals/s / 1.5e6 applied/s with a 60 s best
    of 63.39 on Sycamore — competitive, but 'walker' remains the IM
    product winner at 300 s, so the IM walks default is unchanged;
    FW_SCALE_PROBE_r5.jsonl `im_walks_p128`)."""
    if n_walks is not None:
        return int(n_walks)
    if engine == 'walks':
        return 128 if fw else 32
    return 8


def _resolve_on_block(on_block, engine: str) -> str:
    """Walk scheduling on conflict discard (multiwalk/walks engines)."""
    from tnco_tpu.kernels.sa_multiwalk import _ON_BLOCK
    if on_block is None:
        return 'advance'
    if on_block not in _ON_BLOCK:
        raise ValueError(f"on_block must be one of {_ON_BLOCK}, "
                         f"got {on_block!r}.")
    if on_block != 'advance' and engine not in ('multiwalk', 'walks'):
        raise ValueError(f"on_block={on_block!r} is only supported by "
                         "the 'multiwalk' and 'walks' engines "
                         f"(engine={engine!r}).")
    return on_block


def _resolve_accept_rule(accept_rule, engine: str) -> str:
    """Acceptance rule for the walk-family engines: 'round' (every walk
    tests against the pre-round total) or 'chained' (each walk tests
    against the running total of earlier kept walks — a round becomes
    an exact sequential Metropolis chain, see
    sa_multiwalk._claim_chained)."""
    if accept_rule is None:
        return 'round'
    if accept_rule not in ('round', 'chained'):
        raise ValueError("accept_rule must be 'round' or 'chained', "
                         f"got {accept_rule!r}.")
    if accept_rule != 'round' and engine not in ('multiwalk', 'walks'):
        raise ValueError(f"accept_rule={accept_rule!r} is only supported "
                         "by the 'multiwalk' and 'walks' engines "
                         f"(engine={engine!r}).")
    return accept_rule


class ReplicaRunner:
    """Runs a batch of SA replicas (one connected component) on device.

    Args:
        ctrees: One initial ``ContractionTree`` per replica (same shape).
        seeds: One integer seed (or PRNG key) per replica.
        cmodel: Cost model providing ``device_params`` (sparse support).
        disable_shared_inds: Kernel flag.
        prob_kind: 'mh' | 'mh_local' | 'greedy' | 'base' | None.  None
            picks the engine default: 'mh_local' for engine='sweep'
            (pair-calibrated Metropolis — the totals-ratio rule degrades
            badly under ~N/2 simultaneous proposals on deep trees, see
            kernels/sa_fullsweep._accept), 'mh' everywhere else.
            'mh_local' is sweep-only.
        mesh: Optional ``jax.sharding.Mesh`` to shard the replica axis over
            (defaults to single-device execution).
        dtype: Device log2-cost dtype.
    """

    def __init__(self,
                 ctrees,
                 seeds,
                 *,
                 cmodel=None,
                 disable_shared_inds: bool = False,
                 prob_kind: str | None = None,
                 mesh=None,
                 engine: str = 'auto',
                 n_walks: int | None = None,
                 walk_chunk: int = 0,
                 on_block: str | None = None,
                 accept_rule: str | None = None,
                 dtype=jnp.float32) -> None:
        """``engine``: 'auto' | 'batched' | 'vmapped' | 'native' |
        'multiwalk'.

        ``on_block``: walk scheduling when an accepted proposal is
        discarded by the conflict filter ('advance' | 'restart' |
        'dedup'; multiwalk/walks engines — see
        :func:`tnco_tpu.kernels.sa_multiwalk._advance_walks`).  None
        picks the engine default ('advance').

        The lane-major masked-dense engine does O(N*W) work per move,
        fully vectorized over lanes — a big win for small/medium trees.
        For very large trees (e.g. Sycamore-scale, N*W > ~3e4 words) the
        native CPU engine's O(W)-per-move pointer walk wins; 'auto' picks
        by state size.  'batched' and 'vmapped' produce bit-identical
        trajectories (tests/test_sa_batched.py).

        'multiwalk' runs ``n_walks`` concurrent walks per replica in the
        same masked passes (synchronous SA — reference sweep math, not
        reference walk scheduling): ~2.5x the lockstep throughput and
        measurably better best costs at equal wall-clock
        (docs/QUALITY.md).  Betas are per *iteration* (one proposal per
        walk), not per sweep — opt-in because of the different schedule
        semantics.  ``walk_chunk`` in (0, n_walks) evaluates walks in
        groups of that size (bit-identical results; bounds the fused
        temporaries that stall XLA compilation on very large networks).

        'walks' is the chained multi-walk engine rebuilt on the
        pull/gather machinery (kernels/sa_walks.py): multiwalk
        semantics (P chained leaf-to-root walks per replica) with
        per-iteration cost independent of P — the large-network
        chained engine.  ``n_walks`` applies; ``walk_chunk`` does not.

        'sweep' is the synchronous full-tree engine
        (kernels/sa_fullsweep.py): one proposal at EVERY internal node
        per beta, Luby conflict filtering.  Its default acceptance is
        'mh_local' (pair-ratio Metropolis), whose deltas are per-PAIR
        bits, not per-total — beta schedules need ~50x larger values
        than the totals rule (e.g. beta_max ~3000 where 'mh' uses 60;
        see benchmarks/quality.py).
        """
        ctrees = list(ctrees)
        seeds = list(seeds)
        if len(ctrees) != len(seeds):
            raise ValueError("One seed per replica is required.")
        if not ctrees:
            raise ValueError("'ctrees' cannot be empty.")
        shapes = {(len(c), c.inds_array.shape[1]) for c in ctrees}
        if len(shapes) != 1:
            raise ValueError("All replicas must share the tree shape.")

        self.template = ctrees[0]
        n_lanes = self.template.inds_array.shape[1]
        self.log2d = bitops.pad_log2_dims(self.template.log2_dims_array,
                                          n_lanes, dtype)
        if cmodel is not None and getattr(cmodel, 'sparse_inds', None):
            dev = cmodel.device_params(self.template.inds_order)
            self.sparse_lanes = jnp.asarray(dev['sparse_lanes'])
            self.log2_n_projs = dev['log2_n_projs']
            self.sparse_wb = self.sparse_lanes[:, None]
        else:
            self.sparse_lanes = None
            self.log2_n_projs = None
            self.sparse_wb = None

        if engine == 'auto':
            from tnco_tpu import native
            if len(self.template) * n_lanes <= 32768:
                engine = 'batched'
            elif (_accel_available() and self.sparse_lanes is None and
                  prob_kind in (None, 'mh')):
                # Large networks on a device: the Pallas row-major
                # walker is the device IM winner on the corrected
                # quality protocol (docs/QUALITY.md: Sycamore 300 s
                # 62.71 vs fixed CPU 63.31 / reference 63.17).  On a
                # mesh it runs through run_walker_sharded (shard_map;
                # bit-identical per-replica trajectories).
                engine = 'walker'
            elif (native.available() and self.sparse_lanes is None and
                  not disable_shared_inds and prob_kind in (None, 'mh')):
                # No accelerator: the multithreaded CPU engine's
                # O(W)-per-move pointer walk wins on huge networks.
                engine = 'native'
            else:
                engine = 'vmapped'
        if engine not in ('batched', 'vmapped', 'native', 'multiwalk',
                          'walker', 'sweep', 'walks'):
            raise ValueError(f"Unknown engine: {engine!r}")
        if mesh is not None and engine in _MESHLESS:
            raise ValueError(
                f"engine={engine!r} has no multi-chip execution path "
                "(its Pallas kernels run under plain jit, which GSPMD "
                "cannot partition over a mesh).  Use engine='walks' "
                "(shard_map path, same chained-walk semantics) or drop "
                "the mesh.")
        n_walks = _resolve_walks(engine, n_walks)
        if prob_kind is None:
            prob_kind = 'mh_local' if engine == 'sweep' else 'mh'
        if prob_kind == 'mh_local' and engine not in ('sweep', 'walks'):
            raise ValueError("prob_kind='mh_local' is only supported by "
                             "the 'sweep' and 'walks' engines.")
        self.cfg = sa.SweepConfig(n_leaves=self.template.n_leaves,
                                  n_lanes=n_lanes,
                                  disable_shared_inds=disable_shared_inds,
                                  prob_kind=prob_kind)
        self.engine = engine
        self.n_walks = int(n_walks)
        self.walk_chunk = int(walk_chunk)
        self.on_block = _resolve_on_block(on_block, engine)
        self.accept_rule = _resolve_accept_rule(accept_rule, engine)

        if engine == 'native':
            self._init_native(ctrees, seeds)
            self.n_replicas = len(ctrees)
            self.sweeps_done = 0
            self.moves_done = 0
            self.applied_done = None
            self.mesh = mesh
            self.states = None
            return

        self.log2d_w32 = jnp.asarray(self.log2d).reshape(n_lanes, 32)
        # Batch built on host, uploaded once (both engines share the
        # lane-major layout; the vmapped engine converts per chunk).
        batch = sb.init_batch(ctrees, seeds, np.asarray(self.log2d),
                              sparse_lanes=None if self.sparse_lanes is None
                              else np.asarray(self.sparse_lanes),
                              log2_n_projs=self.log2_n_projs,
                              dtype=np.asarray(self.log2d).dtype)

        if engine == 'vmapped':
            # Replica-major stacked SAStateIM pytree
            batch = _to_vmapped(batch)

        self.mesh = mesh
        if mesh is not None:
            if engine == 'vmapped':
                shard = replica_sharding(mesh)
                batch = jax.tree.map(
                    lambda x: jax.device_put(x, shard), batch)
            else:
                batch = _shard_batch(batch, mesh)
        self.states = batch
        self._mw_pos = (jnp.full((self.n_walks, len(ctrees)), -1,
                                 jnp.int32)
                        if engine in ('multiwalk', 'walker', 'walks')
                        else None)
        self.n_replicas = len(ctrees)
        self.sweeps_done = 0
        self.moves_done = 0
        # Applied-proposal counter (None until an engine reports it;
        # the walk-family and sweep kernels all do).
        self.applied_done = None

    def _init_native(self, ctrees, seeds) -> None:
        """Host-side replica arrays for the native CPU engine."""
        self._nat_nodes = np.stack(
            [c.nodes_array.copy() for c in ctrees])
        self._nat_inds = np.stack([c.inds_array.copy() for c in ctrees])
        self._nat_best_nodes = self._nat_nodes.copy()
        self._nat_best_inds = self._nat_inds.copy()
        self._nat_seeds = np.asarray([int(s) for s in seeds],
                                     dtype=np.uint64)
        self._nat_chunk = 0
        self._nat_best = np.array([
            float(np.log2(float(c.total_cost_exact()))) if
            c.total_cost_exact() > 0 else -np.inf for c in ctrees
        ])

    def _run_native(self, betas, chunk_size, timeout, callback) -> dict:
        from tnco_tpu import native

        betas = np.asarray(betas, dtype=np.float64)
        n = len(betas)
        start = time.perf_counter()
        pos = 0
        chunk_size = max(1, min(chunk_size, n))
        log2d = self.template.log2_dims_array
        while pos < n:
            if timeout is not None and \
                    time.perf_counter() - start > timeout:
                break
            chunk = betas[pos:pos + chunk_size]
            # Fresh per-chunk mt19937 streams (chunk index mixed in).
            seeds = self._nat_seeds + np.uint64(
                1000003 * (self._nat_chunk + 1))
            (best, moves, self._nat_nodes, self._nat_inds, bn,
             bi) = native.sa_run(self._nat_nodes, self._nat_inds, log2d,
                                 chunk, seeds, n_threads=0,
                                 return_final=True)
            improved = best < self._nat_best
            self._nat_best = np.where(improved, best, self._nat_best)
            self._nat_best_nodes[improved] = bn[improved]
            self._nat_best_inds[improved] = bi[improved]
            self._nat_chunk += 1
            self.sweeps_done += len(chunk)
            self.moves_done += moves
            pos += chunk_size
            if callback is not None:
                callback({'progress': min(pos, n) / n,
                          'log2_min_total': self._nat_best.copy()})
        return {
            'log2_min_total': self._nat_best.copy(),
            'sweeps': self.sweeps_done,
            'moves': self.moves_done,
            'applied': self.applied_done,
            'runtime_s': time.perf_counter() - start,
        }

    def run(self,
            betas,
            *,
            chunk_size: int = 128,
            timeout: float | None = None,
            callback=None,
            exchange_every: int = 0,
            exchange_fraction: float = 0.25,
            exchange_islands: int = 1,
            exchange_axes=None) -> dict:
        """Runs one sweep per beta, in fixed-size jitted chunks.

        The chunk is the cooperative-stop granularity: after each chunk the
        host checks the wall-clock budget and publishes live metrics
        (replacing the reference's SharedMemory buffers + threading.Timer,
        tnco/parallel.py:227-248).

        ``exchange_every`` (batched engine): every that many chunks, the
        worst ``exchange_fraction`` of lanes restart from the best lane's
        current tree.  On a mesh the exchange uses explicit
        pmin/psum collectives restricted to ``exchange_axes`` (default:
        all mesh axes) — e.g. only the 'ici' axis of a ('dcn', 'ici')
        mesh, so the frequent exchange never crosses DCN.

        Returns:
            Metrics dict with per-replica ``log2_min_total`` (final) and the
            number of sweeps executed.
        """
        if exchange_every and self.engine not in _LANE_MAJOR:
            from warnings import warn
            warn(f"exchange_every is only supported by the "
                 f"{_LANE_MAJOR} engines "
                 f"(engine={self.engine!r}); ignored.")
        if self.engine == 'native':
            return self._run_native(betas, chunk_size, timeout, callback)
        betas = np.asarray(betas, dtype=np.asarray(self.log2d).dtype)
        start = time.perf_counter()
        n = len(betas)
        pos = 0
        n_chunks = 0
        chunk_size = max(1, min(chunk_size, n))
        # Pad to a whole number of chunks so only one program is compiled.
        while pos < n:
            if timeout is not None and time.perf_counter() - start > timeout:
                break
            chunk = betas[pos:pos + chunk_size]
            if len(chunk) < chunk_size:
                # Repeat the last beta row; extra sweeps at the final
                # temperature only help convergence and keep shapes
                # static.  (betas may be [n] or per-lane [n, B].)
                chunk = np.concatenate(
                    [chunk,
                     np.repeat(chunk[-1:], chunk_size - len(chunk),
                               axis=0)])
            if self.engine == 'batched':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                self.states, metrics = sb.run_sweeps_batched(
                    self.states, jnp.asarray(chunk), self.log2d_w32,
                    self.cfg, self.sparse_wb, self.log2_n_projs,
                    uniform_log2=sfs.uniform_log2_dim(
                        self.template.log2_dims_array))
                last_min = metrics['log2_min_total'][-1]
            elif self.engine == 'multiwalk':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                from tnco_tpu.kernels import sa_multiwalk as smw
                self.states, metrics = smw.run_multiwalk(
                    self.states, jnp.asarray(chunk), self.log2d_w32,
                    self.cfg, self.n_walks, self._mw_pos, self.sparse_wb,
                    self.log2_n_projs, walk_chunk=self.walk_chunk,
                    uniform_log2=sfs.uniform_log2_dim(
                        self.template.log2_dims_array),
                    on_block=self.on_block,
                    accept_rule=self.accept_rule)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'walker':
                from tnco_tpu.kernels import pallas_walker as pwk
                if self.mesh is not None:
                    # shard_map: per-device Pallas kernel on local
                    # replica shards (the Mosaic-on-pods pattern).
                    self.states, metrics = pwk.run_walker_sharded(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self.n_walks, self._mw_pos, self.mesh,
                        self.sparse_wb, self.log2_n_projs)
                else:
                    self.states, metrics = pwk.run_walker(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self.n_walks, self._mw_pos,
                        self.sparse_wb, self.log2_n_projs)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'walks':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                from tnco_tpu.kernels import sa_walks as swk
                ul = sfs.uniform_log2_dim(self.template.log2_dims_array)
                if self.mesh is not None:
                    # shard_map: per-device engine on local replica
                    # shards (the Pallas-on-pods pattern).
                    self.states, metrics = swk.run_walks_sharded(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self._mw_pos, self.mesh,
                        self.sparse_wb, self.log2_n_projs,
                        uniform_log2=ul, on_block=self.on_block,
                        accept_rule=self.accept_rule)
                else:
                    self.states, metrics = swk.run_walks(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self._mw_pos, self.sparse_wb,
                        self.log2_n_projs, uniform_log2=ul,
                        on_block=self.on_block,
                        accept_rule=self.accept_rule)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'sweep':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                self.states, metrics = sfs.run_fullsweep(
                    self.states, jnp.asarray(chunk), self.log2d_w32,
                    self.cfg, self.sparse_wb, self.log2_n_projs,
                    uniform_log2=sfs.uniform_log2_dim(
                        self.template.log2_dims_array))
                last_min = self.states.min_log2_total
            else:
                self.states, metrics = sa.run_sweeps_batch(
                    self.states, jnp.asarray(chunk), self.log2d, self.cfg,
                    self.sparse_lanes, self.log2_n_projs)
                last_min = metrics['log2_min_total'][:, -1]
            self.sweeps_done += chunk_size
            self.moves_done += int(np.sum(metrics['moves']))
            if 'applied' in metrics:
                self.applied_done = ((self.applied_done or 0) +
                                     int(np.sum(metrics['applied'])))
            pos += chunk_size
            n_chunks += 1
            if (exchange_every and
                    self.engine in _LANE_MAJOR and
                    pos < n and n_chunks % exchange_every == 0):
                if self.mesh is not None:
                    self.states = exchange_best_sharded(
                        self.states, self.mesh, exchange_axes,
                        exchange_fraction)
                else:
                    self.states = exchange_best(self.states,
                                                exchange_fraction,
                                                exchange_islands)
            if callback is not None:
                callback({
                    'progress': min(pos, n) / n,
                    'log2_min_total': np.asarray(last_min),
                })
        return {
            'log2_min_total': np.asarray(self.states.min_log2_total),
            'sweeps': self.sweeps_done,
            'moves': self.moves_done,
            'applied': self.applied_done,
            'runtime_s': time.perf_counter() - start,
        }

    def best(self) -> tuple[int, float]:
        """(replica index, log2 cost) of the best replica.

        On a mesh this is the ICI all-reduce replacing the reference's
        end-of-run ``sorted(results)`` (infinite_memory/sa.py:257).
        """
        if self.engine == 'native':
            idx = int(np.argmin(self._nat_best))
            return idx, float(self._nat_best[idx])
        mins = self.states.min_log2_total
        idx = int(jnp.argmin(mins))
        return idx, float(mins[idx])

    def _tree_of(self, c0, c1, par, inds, replica: int):
        nodes = np.stack([
            np.asarray(c0[:, replica]),
            np.asarray(c1[:, replica]),
            np.asarray(par[:, replica])
        ], axis=1)
        return self.template.replace_arrays(
            nodes, np.asarray(inds[..., replica]))

    def min_ctree(self, replica: int):
        """Best tree found by ``replica`` as a host ``ContractionTree``."""
        if self.engine == 'native':
            return self.template.replace_arrays(
                self._nat_best_nodes[replica],
                self._nat_best_inds[replica])
        s = self.states
        if self.engine == 'vmapped':
            return self.template.replace_arrays(
                np.asarray(s.min_nodes[replica]),
                np.asarray(s.min_inds[replica]))
        return self._tree_of(s.min_c0, s.min_c1, s.min_par, s.min_inds,
                             replica)

    def ctree(self, replica: int):
        if self.engine == 'native':
            return self.template.replace_arrays(
                self._nat_nodes[replica], self._nat_inds[replica])
        s = self.states
        if self.engine == 'vmapped':
            return self.template.replace_arrays(
                np.asarray(s.nodes[replica]), np.asarray(s.inds[replica]))
        return self._tree_of(s.c0, s.c1, s.par, s.inds, replica)

    def log2_min_totals(self) -> np.ndarray:
        if self.engine == 'native':
            return self._nat_best.copy()
        return np.asarray(self.states.min_log2_total)


class ReplicaRunnerFW:
    """Finite-width replica batch: slices live in the replica state.

    Same execution model as :class:`ReplicaRunner` with the width-capped
    kernel (:mod:`tnco_tpu.kernels.sa_finite`), including the periodic
    reslice cadence (reference finite_width/sa.py:228:
    ``update_slices=(n % update_slices == 0)``).
    """

    def __init__(self,
                 ctrees,
                 seeds,
                 *,
                 cmodel,
                 skip_slices_lanes=None,
                 disable_shared_inds: bool = False,
                 prob_kind: str | None = None,
                 max_number_new_slices: int = 0,
                 mesh=None,
                 engine: str = 'auto',
                 n_walks: int | None = None,
                 walk_chunk: int = 0,
                 on_block: str | None = None,
                 accept_rule: str | None = None,
                 fw_slicer: str | None = None,
                 dtype=jnp.float32) -> None:
        ctrees = list(ctrees)
        seeds = list(seeds)
        if len(ctrees) != len(seeds) or not ctrees:
            raise ValueError("One seed per replica is required.")
        shapes = {(len(c), c.inds_array.shape[1]) for c in ctrees}
        if len(shapes) != 1:
            raise ValueError("All replicas must share the tree shape.")

        # walks-FW slicer path override (None = auto; 'plane' | 'ref'
        # — see sa_walks.run_walks_fw).
        self.fw_slicer = fw_slicer

        self.template = ctrees[0]
        n_lanes = self.template.inds_array.shape[1]
        self.log2d = bitops.pad_log2_dims(self.template.log2_dims_array,
                                          n_lanes, dtype)
        self.max_width = jnp.asarray(cmodel.max_width, dtype)
        if getattr(cmodel, 'sparse_inds', None):
            dev = cmodel.device_params(self.template.inds_order)
            self.sparse_lanes = jnp.asarray(dev['sparse_lanes'])
            self.log2_n_projs = dev['log2_n_projs']
        else:
            self.sparse_lanes = None
            self.log2_n_projs = None
        self.skip_lanes = (jnp.zeros(n_lanes, dtype=jnp.uint32)
                           if skip_slices_lanes is None else
                           jnp.asarray(skip_slices_lanes))

        if engine == 'auto':
            from tnco_tpu import native
            if (len(self.template) * n_lanes <= 32768 and
                    max_number_new_slices == 0):
                engine = 'batched'
            elif (_accel_available() and self.sparse_lanes is None and
                  max_number_new_slices == 0 and
                  prob_kind in (None, 'mh')):
                # Large width-capped networks on a device: the chained
                # 'walks' engine is the device FW winner; the round-4
                # repeated-cell matrix moved its default operating
                # point to P=128 (per-seed 300 s medians 63.46-63.55
                # beat the CPU arm's 63.97-64.04 on the seeds where
                # P=32 loses by 2.4-4.2 bits — docs/QUALITY.md).
                engine = 'walks'
            elif (native.available() and self.sparse_lanes is None and
                  not disable_shared_inds and prob_kind in (None, 'mh')):
                engine = 'native'
            else:
                engine = 'vmapped'
        if engine not in ('batched', 'vmapped', 'native', 'multiwalk',
                          'walker', 'sweep', 'walks'):
            raise ValueError(f"Unknown engine: {engine!r}")
        if mesh is not None and engine in _MESHLESS:
            raise ValueError(
                f"engine={engine!r} has no multi-chip execution path "
                "(its Pallas kernels run under plain jit, which GSPMD "
                "cannot partition over a mesh).  Use engine='walks' "
                "(shard_map path, same chained-walk semantics) or drop "
                "the mesh.")
        n_walks = _resolve_walks(engine, n_walks, fw=True)
        if prob_kind is None:
            prob_kind = 'mh_local' if engine == 'sweep' else 'mh'
        if prob_kind == 'mh_local' and engine not in ('sweep', 'walks'):
            raise ValueError("prob_kind='mh_local' is only supported by "
                             "the 'sweep' and 'walks' engines.")
        self.cfg = saf.SweepConfigFW(
            n_leaves=self.template.n_leaves,
            n_lanes=n_lanes,
            disable_shared_inds=disable_shared_inds,
            prob_kind=prob_kind,
            max_new_slices=int(max_number_new_slices))
        if engine in ('multiwalk', 'walker', 'sweep',
                      'walks') and max_number_new_slices:
            raise ValueError(f"engine={engine!r} does not support "
                             "max_number_new_slices.")
        self.engine = engine
        self.n_walks = int(n_walks)
        self.walk_chunk = int(walk_chunk)
        self.on_block = _resolve_on_block(on_block, engine)
        self.accept_rule = _resolve_accept_rule(accept_rule, engine)

        if engine == 'native':
            self._init_native_fw(ctrees, seeds)
            self.n_replicas = len(ctrees)
            self.sweeps_done = 0
            self.moves_done = 0
            self.applied_done = None
            self.mesh = mesh
            self.states = None
            return
        self.log2d_w32 = jnp.asarray(self.log2d).reshape(n_lanes, 32)
        self.sparse_wb = (None if self.sparse_lanes is None else
                          self.sparse_lanes[:, None])

        # Host-built batch: one device upload instead of per-replica
        # dispatches (which cost ~1s/replica over a tunneled TPU).
        batch = sfb.init_batch_fw(
            ctrees, seeds, float(self.max_width), np.asarray(self.log2d),
            skip_lanes=np.asarray(self.skip_lanes),
            sparse_lanes=None if self.sparse_lanes is None else
            np.asarray(self.sparse_lanes),
            log2_n_projs=self.log2_n_projs,
            dtype=np.asarray(self.log2d).dtype)
        if engine == 'vmapped':
            batch = _to_vmapped_fw(batch)
        self._mw_pos = (jnp.full((self.n_walks, len(ctrees)), -1,
                                 jnp.int32)
                        if engine in ('multiwalk', 'walker', 'walks')
                        else None)
        self.mesh = mesh
        if mesh is not None:
            shard = replica_sharding(mesh)
            if engine == 'vmapped':
                batch = jax.tree.map(lambda x: jax.device_put(x, shard),
                                     batch)
            else:
                axis = tuple(mesh.axis_names)

                def put(x, replica_axis):
                    spec = [None] * x.ndim
                    spec[replica_axis] = axis
                    return jax.device_put(
                        x, jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec(*spec)))

                leaves, treedef = jax.tree.flatten(batch)
                # keys is the last leaf ([B, 2]); all others replica-last
                leaves = ([put(x, -1) for x in leaves[:-1]] +
                          [put(leaves[-1], 0)])
                batch = jax.tree.unflatten(treedef, leaves)
        self.states = batch
        self.n_replicas = len(ctrees)
        self.sweeps_done = 0
        self.moves_done = 0
        # Applied-proposal counter (None until an engine reports it;
        # the walk-family and sweep kernels all do).
        self.applied_done = None

    def _init_native_fw(self, ctrees, seeds) -> None:
        self._nat_nodes = np.stack(
            [c.nodes_array.copy() for c in ctrees])
        self._nat_inds = np.stack([c.inds_array.copy() for c in ctrees])
        # Initial slices from the host greedy slicer (same ranking as the
        # device slicer; no per-replica device round-trips).
        from random import Random

        skip_np = np.asarray(self.skip_lanes, dtype=np.uint32)
        shifts = np.arange(32, dtype=np.uint32)
        skip_bits = (((skip_np[:, None] >> shifts) & 1).astype(bool)
                     .reshape(-1))
        slices = [
            saf.greedy_slices_host(c.inds_array,
                                   np.asarray(self.log2d, np.float64),
                                   float(self.max_width),
                                   Random(int(s) & 0x7FFFFFFF),
                                   skip_bits=skip_bits)
            for c, s in zip(ctrees, seeds)
        ]
        self._nat_slices = np.stack(slices)
        self._nat_best_nodes = self._nat_nodes.copy()
        self._nat_best_inds = self._nat_inds.copy()
        self._nat_best_slices = self._nat_slices.copy()
        self._nat_seeds = np.asarray([int(s) for s in seeds],
                                     dtype=np.uint64)
        self._nat_chunk = 0
        self._nat_best = np.full(len(ctrees), np.inf)

    def _run_native_fw(self, betas, update_slices, chunk_size, timeout,
                       callback) -> dict:
        from tnco_tpu import native

        betas = np.asarray(betas, dtype=np.float64)
        n = len(betas)
        start = time.perf_counter()
        pos = 0
        chunk_size = max(1, min(chunk_size, n))
        log2d = self.template.log2_dims_array
        skip = np.asarray(self.skip_lanes, dtype=np.uint32)
        while pos < n:
            if (timeout is not None and
                    time.perf_counter() - start > timeout):
                break
            chunk = betas[pos:pos + chunk_size]
            seeds = self._nat_seeds + np.uint64(
                1000003 * (self._nat_chunk + 1))
            (best, moves, self._nat_nodes, self._nat_inds,
             self._nat_slices, bn, bi, bs) = native.sa_run_fw(
                 self._nat_nodes, self._nat_inds, self._nat_slices, log2d,
                 skip, float(self.max_width), chunk, seeds,
                 reslice_every=update_slices, n_threads=0,
                 max_new_slices=self.cfg.max_new_slices,
                 return_final=True)
            improved = best < self._nat_best
            self._nat_best = np.where(improved, best, self._nat_best)
            self._nat_best_nodes[improved] = bn[improved]
            self._nat_best_inds[improved] = bi[improved]
            self._nat_best_slices[improved] = bs[improved]
            self._nat_chunk += 1
            self.sweeps_done += len(chunk)
            self.moves_done += moves
            pos += chunk_size
            if callback is not None:
                callback({'progress': min(pos, n) / n,
                          'log2_min_total': self._nat_best.copy()})
        return {
            'log2_min_total': self._nat_best.copy(),
            'sweeps': self.sweeps_done,
            'moves': self.moves_done,
            'applied': self.applied_done,
            'runtime_s': time.perf_counter() - start,
        }

    def run(self,
            betas,
            *,
            update_slices: int = 10,
            chunk_size: int = 128,
            timeout: float | None = None,
            callback=None,
            exchange_every: int = 0,
            exchange_fraction: float = 0.25,
            exchange_islands: int = 1,
            exchange_axes=None) -> dict:
        if exchange_every and self.engine not in _LANE_MAJOR:
            from warnings import warn
            warn(f"exchange_every is only supported by the "
                 f"{_LANE_MAJOR} engines "
                 f"(engine={self.engine!r}); ignored.")
        if self.engine == 'native':
            return self._run_native_fw(betas, update_slices, chunk_size,
                                       timeout, callback)
        betas = np.asarray(betas, dtype=np.asarray(self.log2d).dtype)
        n = len(betas)
        mask = ((np.arange(n) % max(1, update_slices)) == 0
                if update_slices else np.zeros(n, dtype=bool))
        start = time.perf_counter()
        pos = 0
        n_chunks = 0
        chunk_size = max(1, min(chunk_size, n))
        while pos < n:
            if timeout is not None and time.perf_counter() - start > timeout:
                break
            chunk = betas[pos:pos + chunk_size]
            mchunk = mask[pos:pos + chunk_size]
            if len(chunk) < chunk_size:
                pad = chunk_size - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
                mchunk = np.concatenate([mchunk, np.zeros(pad, dtype=bool)])
            if self.engine == 'batched':
                from tnco_tpu.kernels import sa_fullsweep as sfs

                # This engine is BIT-IDENTICAL to the vmapped kernel;
                # only integer log2 dims keep the popcount widths exact,
                # so gate harder than the walk-family engines do.
                ul = sfs.uniform_log2_dim(self.template.log2_dims_array)
                if ul is not None and not float(ul).is_integer():
                    ul = None
                self.states, metrics = sfb.run_sweeps_fw_batched(
                    self.states, jnp.asarray(chunk), jnp.asarray(mchunk),
                    self.max_width, self.log2d_w32, self.skip_lanes,
                    self.cfg, self.sparse_wb, self.log2_n_projs,
                    uniform_log2=ul)
                last_min = metrics['log2_min_total'][-1]
            elif self.engine == 'multiwalk':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                from tnco_tpu.kernels import sa_multiwalk as smw
                self.states, metrics = smw.run_multiwalk_fw(
                    self.states, jnp.asarray(chunk), jnp.asarray(mchunk),
                    self.max_width, self.log2d_w32, self.skip_lanes,
                    self.cfg, self.n_walks, self._mw_pos, self.sparse_wb,
                    self.log2_n_projs, walk_chunk=self.walk_chunk,
                    uniform_log2=sfs.uniform_log2_dim(
                        self.template.log2_dims_array),
                    on_block=self.on_block,
                    accept_rule=self.accept_rule)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'walker':
                from tnco_tpu.kernels import pallas_walker as pwk
                if self.mesh is not None:
                    fw_args = (np.asarray(mchunk), self.max_width,
                               self.skip_lanes)
                    self.states, metrics = pwk.run_walker_sharded(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self.n_walks, self._mw_pos, self.mesh,
                        self.sparse_wb, self.log2_n_projs,
                        fw_args=fw_args)
                else:
                    self.states, metrics = pwk.run_walker_fw(
                        self.states, jnp.asarray(chunk),
                        np.asarray(mchunk), self.max_width,
                        self.log2d_w32, self.skip_lanes, self.cfg,
                        self.n_walks, self._mw_pos, self.sparse_wb,
                        self.log2_n_projs)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'walks':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                from tnco_tpu.kernels import sa_walks as swk
                ul = sfs.uniform_log2_dim(self.template.log2_dims_array)
                if self.mesh is not None:
                    fw_args = (jnp.asarray(mchunk), self.max_width,
                               self.skip_lanes)
                    self.states, metrics = swk.run_walks_sharded(
                        self.states, jnp.asarray(chunk), self.log2d_w32,
                        self.cfg, self._mw_pos, self.mesh,
                        self.sparse_wb, self.log2_n_projs,
                        uniform_log2=ul, fw_args=fw_args,
                        on_block=self.on_block,
                        accept_rule=self.accept_rule,
                        slicer=self.fw_slicer)
                else:
                    self.states, metrics = swk.run_walks_fw(
                        self.states, jnp.asarray(chunk),
                        jnp.asarray(mchunk), self.max_width,
                        self.log2d_w32, self.skip_lanes, self.cfg,
                        self._mw_pos, self.sparse_wb,
                        self.log2_n_projs, uniform_log2=ul,
                        on_block=self.on_block,
                        accept_rule=self.accept_rule,
                        slicer=self.fw_slicer)
                self._mw_pos = metrics['pos']
                last_min = self.states.min_log2_total
            elif self.engine == 'sweep':
                from tnco_tpu.kernels import sa_fullsweep as sfs
                self.states, metrics = sfs.run_fullsweep_fw(
                    self.states, jnp.asarray(chunk), jnp.asarray(mchunk),
                    self.max_width, self.log2d_w32, self.skip_lanes,
                    self.cfg, self.sparse_wb, self.log2_n_projs,
                    uniform_log2=sfs.uniform_log2_dim(
                        self.template.log2_dims_array))
                last_min = self.states.min_log2_total
            else:
                self.states, metrics = saf.run_sweeps_fw_batch(
                    self.states, jnp.asarray(chunk), jnp.asarray(mchunk),
                    self.max_width, self.log2d, self.skip_lanes, self.cfg,
                    self.sparse_lanes, self.log2_n_projs)
                last_min = metrics['log2_min_total'][:, -1]
            self.sweeps_done += chunk_size
            self.moves_done += int(np.sum(metrics['moves']))
            if 'applied' in metrics:
                self.applied_done = ((self.applied_done or 0) +
                                     int(np.sum(metrics['applied'])))
            pos += chunk_size
            n_chunks += 1
            if (exchange_every and
                    self.engine in _LANE_MAJOR and
                    pos < n and n_chunks % exchange_every == 0):
                if self.mesh is not None:
                    self.states = exchange_best_fw_sharded(
                        self.states, self.mesh, exchange_axes,
                        exchange_fraction)
                else:
                    self.states = exchange_best_fw(self.states,
                                                   exchange_fraction,
                                                   exchange_islands)
            if callback is not None:
                callback({
                    'progress': min(pos, n) / n,
                    'log2_min_total': np.asarray(last_min),
                })
        return {
            'log2_min_total': np.asarray(self.states.min_log2_total),
            'sweeps': self.sweeps_done,
            'moves': self.moves_done,
            'applied': self.applied_done,
            'runtime_s': time.perf_counter() - start,
        }

    def min_ctree(self, replica: int):
        if self.engine == 'native':
            return self.template.replace_arrays(
                self._nat_best_nodes[replica],
                self._nat_best_inds[replica])
        s = self.states
        if self.engine in _LANE_MAJOR:
            nodes = np.stack([
                np.asarray(s.min_c0[:, replica]),
                np.asarray(s.min_c1[:, replica]),
                np.asarray(s.min_par[:, replica])
            ], axis=1)
            return self.template.replace_arrays(
                nodes, np.asarray(s.min_inds[..., replica]))
        nodes = np.asarray(s.min_nodes[replica])
        inds = np.asarray(s.min_inds[replica])
        return self.template.replace_arrays(nodes, inds)

    def ctree(self, replica: int):
        """Current (not best) tree of ``replica``."""
        if self.engine == 'native':
            return self.template.replace_arrays(
                self._nat_nodes[replica], self._nat_inds[replica])
        s = self.states
        if self.engine in _LANE_MAJOR:
            nodes = np.stack([
                np.asarray(s.c0[:, replica]),
                np.asarray(s.c1[:, replica]),
                np.asarray(s.par[:, replica])
            ], axis=1)
            return self.template.replace_arrays(
                nodes, np.asarray(s.inds[..., replica]))
        return self.template.replace_arrays(
            np.asarray(s.nodes[replica]), np.asarray(s.inds[replica]))

    def slices_lanes(self, replica: int) -> np.ndarray:
        """Current slice lanes of ``replica``."""
        if self.engine == 'native':
            return self._nat_slices[replica].copy()
        if self.engine in _LANE_MAJOR:
            return np.asarray(self.states.slices[..., replica])
        return np.asarray(self.states.slices[replica])

    def min_slices_lanes(self, replica: int) -> np.ndarray:
        if self.engine == 'native':
            return self._nat_best_slices[replica].copy()
        if self.engine in _LANE_MAJOR:
            return np.asarray(self.states.min_slices[..., replica])
        return np.asarray(self.states.min_slices[replica])

    def log2_min_totals(self) -> np.ndarray:
        if self.engine == 'native':
            return self._nat_best.copy()
        return np.asarray(self.states.min_log2_total)


def _island_exchange_plan(lt, fraction: float, islands: int, active):
    """Shared worst-lane/source computation for the exchange operators.

    With ``islands=G`` the replica axis splits into G equal contiguous
    groups and the best/worst selection runs PER GROUP: intensification
    stays within an island while the population keeps G independent
    chances of landing in a good basin.  Round 4 showed the
    whole-population topology has a ~1/3 collapse mode on the FW
    flagship (every lane absorbed into a ~68.3 attractor before any
    finds <68 — docs/QUALITY.md round-5 diagnosis); islands bound that
    risk at ~(1/3)^G while each island keeps the measured
    exchange-cadence-4 intensification.

    ``active`` (optional ``bool[G]``) gates exchange per island — the
    stall kicker suspends a freshly-kicked island so its re-diversified
    lanes are not immediately overwritten by the island best.

    Returns ``(worst_mask[B], src_idx[G], best_val[G])``.
    """
    b = lt.shape[0]
    g = max(1, int(islands))
    if b % g:
        raise ValueError(f"islands={g} must divide the replica count "
                         f"{b}.")
    bg = b // g
    k = max(1, int(bg * fraction))
    lt2 = lt.reshape(g, bg)
    best = jnp.argmin(lt2, axis=1)                           # [G]
    best_val = jnp.take_along_axis(lt2, best[:, None], axis=1)
    # Worst-k mask by cost threshold; lanes already tied with their
    # island best keep their (structurally distinct) trees, matching
    # the sharded exchange's guard.
    thresh = jnp.sort(lt2, axis=1)[:, bg - k]
    worst2 = (lt2 >= thresh[:, None]) & (lt2 > best_val)
    if active is not None:
        worst2 = worst2 & jnp.asarray(active).reshape(g, 1)
    return worst2.reshape(b), best, best_val


def _island_mix(cur, worst, best, g):
    """Copies each island's best lane into its worst lanes (replica
    axis LAST)."""
    b = cur.shape[-1]
    lead = cur.shape[:-1]
    cur2 = cur.reshape(lead + (g, b // g))
    idx = best.reshape((1,) * len(lead) + (g, 1))
    src = jnp.take_along_axis(cur2, idx, axis=-1)
    mask = worst.reshape((1,) * len(lead) + (g, b // g))
    return jnp.where(mask, src, cur2).reshape(cur.shape)


def exchange_best(states: 'sb.SABatch', fraction: float = 0.25,
                  islands: int = 1, active=None) -> 'sb.SABatch':
    """Population exchange: restart the worst lanes from the best tree.

    Between annealing chunks, replaces the *current* tree of the worst
    ``fraction`` of replicas (by current total cost) with the best
    replica's current tree; min snapshots are untouched.  This is the
    replica-batch upgrade of the reference's fully-independent runs — on a
    mesh the argmin/broadcast ride ICI collectives.  Lane-major batches
    only.  ``islands``/``active``: per-group topology, see
    :func:`_island_exchange_plan`.
    """
    lt = states.log2_total
    g = max(1, int(islands))
    worst, best, best_val = _island_exchange_plan(lt, fraction, g, active)

    def mix(cur):
        return _island_mix(cur, worst, best, g)

    lt_best = jnp.broadcast_to(best_val,
                               (g, lt.shape[0] // g)).reshape(-1)
    return sb.SABatch(
        mix(states.c0), mix(states.c1), mix(states.par),
        mix(states.inds), mix(states.hyper), mix(states.lcc),
        jnp.where(worst, lt_best, lt), states.min_log2_total,
        states.min_c0, states.min_c1, states.min_par, states.min_inds,
        states.keys)


def exchange_best_sharded(states: 'sb.SABatch', mesh, axis_names=None,
                          fraction: float = 0.25) -> 'sb.SABatch':
    """Mesh-aware population exchange with explicit collectives.

    ``shard_map`` version of :func:`exchange_best`: within each group of
    devices spanned by ``axis_names`` (default: all mesh axes), the
    globally best replica's current tree is found with a ``pmin`` over the
    group and broadcast with a masked ``psum`` — both ride ICI when the
    axis maps to intra-slice links; restricting ``axis_names`` to the ICI
    axis of a 2-D ``('dcn', 'ici')`` mesh keeps the frequent exchange off
    DCN entirely (SURVEY.md §2.3 / §5 "distributed communication").
    Each device then restarts its worst ``fraction`` of *local* lanes
    from that tree.  Min snapshots and PRNG keys are untouched.
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names) if axis_names is None else \
        tuple(axis_names)
    all_axes = tuple(mesh.axis_names)

    def spec_of(x, replica_axis):
        s = [None] * x.ndim
        s[replica_axis] = all_axes
        return P(*s)

    batch_tuple = (states.c0, states.c1, states.par, states.inds,
                   states.hyper, states.lcc, states.log2_total)
    in_specs = tuple(spec_of(x, -1) for x in batch_tuple)

    def body(c0, c1, par, inds, hyper, lcc, lt):
        # Local best lane
        li = jnp.argmin(lt)
        local_min = lt[li]
        # Group-wide best cost over the exchange axes (ICI/DCN pmin)
        group_min = jax.lax.pmin(local_min, axes)
        # Deterministic owner: lowest linear index among ties
        lin = jnp.int32(0)
        stride = 1
        for ax in reversed(axes):
            lin = lin + jax.lax.axis_index(ax) * stride
            stride *= mesh.shape[ax]
        owner = jax.lax.pmin(
            jnp.where(local_min == group_min, lin, jnp.int32(2**30)),
            axes)
        is_owner = (lin == owner) & (local_min == group_min)

        def bcast(x):
            # Masked all-reduce broadcast of the owner's best lane
            contrib = jnp.where(is_owner, x[..., li], 0)
            if x.dtype == jnp.uint32:
                return jax.lax.psum(contrib.astype(jnp.int32),
                                    axes).astype(jnp.uint32)
            return jax.lax.psum(contrib, axes)

        bc0, bc1, bpar = bcast(c0), bcast(c1), bcast(par)
        binds, bhyper = bcast(inds), bcast(hyper)
        blcc = bcast(lcc)

        # Replace the worst local lanes
        b = lt.shape[0]
        k = max(1, int(b * fraction))
        thresh = jnp.sort(lt)[b - k]
        worst = (lt >= thresh) & (lt > group_min)
        wn = worst[None, :]
        ww = worst[None, None, :]
        return (jnp.where(wn, bc0[:, None], c0),
                jnp.where(wn, bc1[:, None], c1),
                jnp.where(wn, bpar[:, None], par),
                jnp.where(ww, binds[:, :, None], inds),
                jnp.where(ww, bhyper[:, :, None], hyper),
                jnp.where(wn, blcc[:, None], lcc),
                jnp.where(worst, group_min, lt))

    shmap = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=in_specs)
    c0, c1, par, inds, hyper, lcc, lt = shmap(*batch_tuple)
    return sb.SABatch(c0, c1, par, inds, hyper, lcc, lt,
                      states.min_log2_total, states.min_c0, states.min_c1,
                      states.min_par, states.min_inds, states.keys)


def exchange_best_fw(states: 'sfb.SABatchFW', fraction: float = 0.25,
                     islands: int = 1, active=None) -> 'sfb.SABatchFW':
    """Finite-width population exchange (slices travel with the tree).

    Same contract as :func:`exchange_best`: the worst ``fraction`` of
    lanes (by current total cost) restart from the best lane's current
    tree *and slice set*; lanes tied with the best keep their trees; min
    snapshots and PRNG keys are untouched.  ``islands``/``active``:
    per-group topology, see :func:`_island_exchange_plan`.
    """
    lt = states.log2_total
    g = max(1, int(islands))
    worst, best, best_val = _island_exchange_plan(lt, fraction, g, active)

    def mix(cur):
        return _island_mix(cur, worst, best, g)

    lt_best = jnp.broadcast_to(best_val,
                               (g, lt.shape[0] // g)).reshape(-1)
    return sfb.SABatchFW(
        mix(states.c0), mix(states.c1), mix(states.par), mix(states.inds),
        mix(states.hyper), mix(states.lcc), mix(states.width),
        mix(states.slices), jnp.where(worst, lt_best, lt),
        states.min_log2_total, states.min_c0, states.min_c1,
        states.min_par, states.min_inds, states.min_slices, states.keys)

def exchange_best_fw_sharded(states: 'sfb.SABatchFW', mesh,
                             axis_names=None, fraction: float = 0.25
                             ) -> 'sfb.SABatchFW':
    """Mesh-aware finite-width population exchange.

    :func:`exchange_best_sharded` with the slice set and pre-slice
    widths travelling alongside the tree — the pmin/psum collectives
    are restricted to ``axis_names`` exactly as in the IM variant, so
    frequent exchange stays on ICI for a 2-D ('dcn', 'ici') mesh.
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names) if axis_names is None else \
        tuple(axis_names)
    all_axes = tuple(mesh.axis_names)

    def spec_of(x, replica_axis):
        sp = [None] * x.ndim
        sp[replica_axis] = all_axes
        return P(*sp)

    batch_tuple = (states.c0, states.c1, states.par, states.inds,
                   states.hyper, states.lcc, states.width, states.slices,
                   states.log2_total)
    in_specs = tuple(spec_of(x, -1) for x in batch_tuple)

    def body(c0, c1, par, inds, hyper, lcc, width, slices, lt):
        li = jnp.argmin(lt)
        local_min = lt[li]
        group_min = jax.lax.pmin(local_min, axes)
        lin = jnp.int32(0)
        stride = 1
        for ax in reversed(axes):
            lin = lin + jax.lax.axis_index(ax) * stride
            stride *= mesh.shape[ax]
        owner = jax.lax.pmin(
            jnp.where(local_min == group_min, lin, jnp.int32(2**30)),
            axes)
        is_owner = (lin == owner) & (local_min == group_min)

        def bcast(x):
            contrib = jnp.where(is_owner, x[..., li], 0)
            if x.dtype == jnp.uint32:
                return jax.lax.psum(contrib.astype(jnp.int32),
                                    axes).astype(jnp.uint32)
            return jax.lax.psum(contrib, axes)

        bc0, bc1, bpar = bcast(c0), bcast(c1), bcast(par)
        binds, bhyper = bcast(inds), bcast(hyper)
        blcc, bwidth, bslices = bcast(lcc), bcast(width), bcast(slices)

        b = lt.shape[0]
        k = max(1, int(b * fraction))
        thresh = jnp.sort(lt)[b - k]
        worst = (lt >= thresh) & (lt > group_min)
        wn = worst[None, :]
        ww = worst[None, None, :]
        return (jnp.where(wn, bc0[:, None], c0),
                jnp.where(wn, bc1[:, None], c1),
                jnp.where(wn, bpar[:, None], par),
                jnp.where(ww, binds[:, :, None], inds),
                jnp.where(ww, bhyper[:, :, None], hyper),
                jnp.where(wn, blcc[:, None], lcc),
                jnp.where(wn, bwidth[:, None], width),
                jnp.where(wn, bslices[:, None], slices),
                jnp.where(worst, group_min, lt))

    shmap = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                          out_specs=in_specs)
    (c0, c1, par, inds, hyper, lcc, width, slices,
     lt) = shmap(*batch_tuple)
    return sfb.SABatchFW(
        c0, c1, par, inds, hyper, lcc, width, slices, lt,
        states.min_log2_total, states.min_c0, states.min_c1,
        states.min_par, states.min_inds, states.min_slices, states.keys)


def _kick_cols_fw(c0, c1, inds, width, seeds, src, log2d_w32, skip_wb,
                  sparse_wb, *, max_width, log2_n_projs, uniform_log2,
                  n_leaves):
    """Device half of the slice-kick: fresh greedy slices + costs for
    ALL ``B`` columns restarted from column ``src``'s tree.

    Runs the in-kernel device slicer (``sfb._greedy_slices_b`` — the
    same ranking the reslice cadence uses) on the source tree broadcast
    across the full lane axis, one independent jitter key per lane, and
    re-derives the slice-aware ``lcc`` and the pinned log2 total.  The
    caller writes only the victim columns; computing every lane keeps
    the program shape FIXED at ``[N, W, B]`` so one compile serves every
    kick regardless of the victim count (the per-victim host slicer it
    replaces cost ~0.25 s/lane + tunnel round-trips — ~2.2 s/kick,
    ~18% of a 300 s quality cell at the product kick rate).

    ``src`` is a traced scalar (changing the source lane never
    recompiles).  Key discipline matches ``sfb.init_batch_fw``: the
    carried key is ``split(PRNGKey-like([0, seed]))[0]`` — bitwise the
    host path's keys — and the slicer consumes ``split(...)[1]``.
    """
    from tnco_tpu.ops import costs as costs_ops

    n, w, b = inds.shape
    inds_k = jnp.broadcast_to(jnp.take(inds, src, axis=-1)[:, :, None],
                              (n, w, b))
    c0_k = jnp.broadcast_to(jnp.take(c0, src, axis=-1)[:, None], (n, b))
    c1_k = jnp.broadcast_to(jnp.take(c1, src, axis=-1)[:, None], (n, b))
    width_k = jnp.broadcast_to(jnp.take(width, src, axis=-1)[:, None],
                               (n, b))
    keys0 = jnp.stack([jnp.zeros_like(seeds), seeds], axis=1)
    pair = jax.vmap(jax.random.split)(keys0)            # [b, 2, 2]
    slices = sfb._greedy_slices_b(
        c0_k, inds_k, width_k, pair[:, 1], max_width, log2d_w32,
        skip_wb, sparse_wb, log2_n_projs, uniform_log2=uniform_log2)
    lcc = sfb._lcc_fw_b(c0_k, c1_k, inds_k, slices, log2d_w32,
                        sparse_wb, log2_n_projs,
                        uniform_log2=uniform_log2)
    lt = costs_ops.log2_total_from_lcc(lcc, n_leaves)
    return slices, lcc, lt, pair[:, 0]


_kick_cols_fw = jax.jit(
    _kick_cols_fw,
    static_argnames=('max_width', 'log2_n_projs', 'uniform_log2',
                     'n_leaves'))


def kick_lanes_fw(runner: 'ReplicaRunnerFW', lanes, src: int,
                  seed: int, *, slicer: str = 'device') -> None:
    """Slice-kick: restart ``lanes`` from ``src``'s current tree with
    FORCED fresh slice sets and fresh PRNG streams.

    The FW stuck mode (docs/QUALITY.md round-5 diagnosis) is a joint
    tree+slice attractor the in-kernel reslice cannot leave: reslice is
    keep-iff-better (reference finite_width/greedy/optimizer.hpp:359-376
    semantics), so a slice set that must get temporarily WORSE to
    unlock blocked tree moves is never adopted.  This operator breaks
    the gate from outside the kernels, between annealing chunks: each
    kicked lane gets the source lane's current tree, an UNGATED fresh
    greedy slice draw (per-lane jitter), a fresh counter-based key, and
    a restarted walk position.  Min snapshots are untouched, so the
    reported best can never regress; per-lane trajectories of
    non-kicked lanes are bitwise unaffected (pure column mixing).

    ``slicer`` picks where the fresh draw runs: ``'device'`` (default)
    uses the in-kernel batched slicer via :func:`_kick_cols_fw` at a
    FIXED program shape (~0.1 s/kick after the one-time compile, which
    the quality driver pays in its warm-up); ``'host'`` is the original
    per-victim host slicer (no compile, ~0.25 s/victim — the right
    tool for one-off kicks in short-lived processes).  Both draw
    width-valid greedy slice sets; they differ only in jitter stream.

    Lane-major (``_LANE_MAJOR``) single-mesh runners only; rare —
    drive it from :class:`tnco_tpu.parallel.stall.IslandStallKicker`.
    """
    from random import Random

    if runner.engine not in _LANE_MAJOR or runner.states is None:
        raise ValueError("kick_lanes_fw needs a lane-major device "
                         f"engine (engine={runner.engine!r}).")
    if slicer not in ('device', 'host'):
        raise ValueError(f"slicer must be 'device' or 'host', "
                         f"got {slicer!r}.")
    s = runner.states
    b = int(s.log2_total.shape[0])
    lanes = np.asarray(sorted(set(int(x) for x in lanes)), dtype=np.int64)
    if lanes.size == 0:
        return
    mask = np.zeros(b, dtype=bool)
    mask[lanes] = True
    mask_j = jnp.asarray(mask)
    src = int(src)

    def mix(cur):
        srcv = jnp.take(cur, src, axis=-1)[..., None]
        m = mask_j.reshape((1,) * (cur.ndim - 1) + (b,))
        return jnp.where(m, srcv, cur)

    if slicer == 'device':
        from tnco_tpu.kernels import sa_fullsweep as sfs

        ul = sfs.uniform_log2_dim(runner.template.log2_dims_array)
        # The per-(kick, lane) seed formula matches the host path, so
        # a victim's carried key is bitwise the same under either
        # slicer; non-victim seeds are computed but discarded (the
        # fixed all-lane shape is what buys compile reuse).
        seeds_all = jnp.asarray(np.fromiter(
            ((seed * 2654435761 + 7919 * lane) & 0xFFFFFFFF
             for lane in range(b)), dtype=np.uint32, count=b))
        slices_all, lcc_all, lt_all, keys_all = _kick_cols_fw(
            s.c0, s.c1, s.inds, s.width, seeds_all, jnp.int32(src),
            runner.log2d_w32, runner.skip_lanes, runner.sparse_wb,
            max_width=float(runner.max_width),
            log2_n_projs=(None if runner.log2_n_projs is None
                          else float(runner.log2_n_projs)),
            uniform_log2=None if ul is None else float(ul),
            n_leaves=int(runner.template.n_leaves))
        runner.states = sfb.SABatchFW(
            mix(s.c0), mix(s.c1), mix(s.par), mix(s.inds), mix(s.hyper),
            jnp.where(mask_j[None, :], lcc_all.astype(s.lcc.dtype),
                      s.lcc),
            mix(s.width),
            jnp.where(mask_j[None, :], slices_all, s.slices),
            jnp.where(mask_j, lt_all.astype(s.log2_total.dtype),
                      s.log2_total),
            s.min_log2_total, s.min_c0, s.min_c1, s.min_par,
            s.min_inds, s.min_slices,
            jnp.where(mask_j[:, None], keys_all, s.keys))
        if runner._mw_pos is not None:
            runner._mw_pos = jnp.where(mask_j[None, :], jnp.int32(-1),
                                       runner._mw_pos)
        return

    # Host side: fresh greedy slice sets for the SOURCE tree, one
    # independent draw per kicked lane, and the (tree, slices)
    # slice-aware costs — the same recipe as sfb.init_batch_fw (the
    # engines recompute their own pinned totals at entry, so host
    # float64 values only need to rank correctly for exchange).
    inds_src = np.asarray(s.inds[..., src])                  # [N, W]
    c0_src = np.asarray(s.c0[:, src])
    c1_src = np.asarray(s.c1[:, src])
    n, w = inds_src.shape
    log2d = np.asarray(runner.log2d, dtype=np.float64)       # [w*32]
    mw = float(runner.max_width)
    shifts = np.arange(32, dtype=np.uint32)

    def expand(lanes_u32):  # [..., w] -> bool [..., w*32]
        bits = (lanes_u32[..., :, None] >> shifts) & 1
        return bits.astype(bool).reshape(*lanes_u32.shape[:-1], w * 32)

    skip_np = np.asarray(runner.skip_lanes, dtype=np.uint32)
    skip_bits = expand(skip_np) if skip_np.any() else None
    sparse_bits = None
    log2_n_projs = runner.log2_n_projs
    if runner.sparse_lanes is not None:
        sparse_bits = expand(np.asarray(runner.sparse_lanes,
                                        dtype=np.uint32))

    def width_of(bits):
        if sparse_bits is None:
            return bits @ log2d
        return ((bits & ~sparse_bits) @ log2d +
                np.minimum((bits & sparse_bits) @ log2d,
                           float(log2_n_projs)))

    k = lanes.size
    new_slices = np.empty((w, k), dtype=np.uint32)
    for j, lane in enumerate(lanes):
        new_slices[:, j] = saf.greedy_slices_host(
            inds_src, log2d, mw, Random((seed * 1000003 + int(lane))
                                        & 0x7FFFFFFF),
            skip_bits=skip_bits, sparse_bits=sparse_bits,
            log2_n_projs=log2_n_projs)

    internal = c0_src >= 0
    gather = np.take_along_axis
    inds_c0 = gather(inds_src, np.where(internal, c0_src, 0)[:, None],
                     axis=0)
    inds_c1 = gather(inds_src, np.where(internal, c1_src, 0)[:, None],
                     axis=0)
    dtype = np.asarray(s.lcc).dtype
    n_leaves = runner.template.n_leaves
    new_lcc = np.empty((n, k), dtype=np.float64)
    new_lt = np.empty(k, dtype=np.float64)
    for j in range(k):
        union = expand(inds_c0 | inds_c1 | new_slices[None, :, j])
        lcc_j = np.where(internal, width_of(union), -np.inf)
        new_lcc[:, j] = lcc_j
        tail = lcc_j[n_leaves:]
        if tail.size:
            m = tail.max()
            new_lt[j] = m + np.log2(np.exp2(tail - m).sum())
        else:
            new_lt[j] = -np.inf

    # Fresh keys: PRNGKey(seed')-split-once, the init_batch_fw key
    # discipline, with a per-(kick, lane) counter-derived seed.
    seeds_new = np.asarray(
        [(seed * 2654435761 + 7919 * int(lane)) & 0xFFFFFFFF
         for lane in lanes], dtype=np.uint32)
    keys0 = jnp.stack([jnp.zeros_like(jnp.asarray(seeds_new)),
                       jnp.asarray(seeds_new)], axis=1)
    keys_new = jax.vmap(lambda kk: jax.random.split(kk)[0])(keys0)

    lanes_j = jnp.asarray(lanes)
    runner.states = sfb.SABatchFW(
        mix(s.c0), mix(s.c1), mix(s.par), mix(s.inds), mix(s.hyper),
        s.lcc.at[:, lanes_j].set(jnp.asarray(new_lcc.astype(dtype))),
        mix(s.width),
        s.slices.at[:, lanes_j].set(jnp.asarray(new_slices)),
        s.log2_total.at[lanes_j].set(
            jnp.asarray(new_lt.astype(dtype))),
        s.min_log2_total, s.min_c0, s.min_c1, s.min_par, s.min_inds,
        s.min_slices, s.keys.at[lanes_j].set(keys_new))
    if runner._mw_pos is not None:
        runner._mw_pos = jnp.where(mask_j[None, :], jnp.int32(-1),
                                   runner._mw_pos)
