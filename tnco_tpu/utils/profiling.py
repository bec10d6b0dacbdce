"""Profiling and live-metrics helpers.

The reference's observability is rich progress bars + ``runtime_s``
(SURVEY.md §5).  The TPU-native equivalents: ``jax.profiler`` traces around
annealing chunks and a moves/sec counter fed by the kernels' move metrics.
"""

from contextlib import contextmanager
import time

__all__ = ['trace', 'ThroughputCounter']


@contextmanager
def trace(log_dir: str | None):
    """``jax.profiler`` trace context (no-op when ``log_dir`` is None).

    View with TensorBoard / xprof pointed at ``log_dir``.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputCounter:
    """Accumulates SA move counts and reports moves/sec."""

    def __init__(self) -> None:
        self.moves = 0
        self.sweeps = 0
        self._start = time.perf_counter()

    def add(self, moves: int, sweeps: int = 0) -> None:
        self.moves += int(moves)
        self.sweeps += int(sweeps)

    @property
    def elapsed_s(self) -> float:
        return time.perf_counter() - self._start

    @property
    def moves_per_sec(self) -> float:
        dt = self.elapsed_s
        return self.moves / dt if dt > 0 else 0.0

    def report(self) -> dict:
        return {
            'moves': self.moves,
            'sweeps': self.sweeps,
            'runtime_s': self.elapsed_s,
            'moves_per_sec': self.moves_per_sec,
        }
