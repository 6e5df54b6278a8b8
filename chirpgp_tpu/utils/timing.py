"""Structured timing and profiling utilities.

The reference measures performance with ad-hoc ``time.time()`` prints and
manual JIT warm-up calls scattered through drivers
(``paper_plots_tables/print_time.py:44-61``,
``real_applications/bats/myotis_myotis_analysis.py:81-85``).  Here timing
is a first-class utility: warm-up, block-until-ready, repeats with
min/median statistics, and an optional ``jax.profiler`` trace hook.
"""

import contextlib
import statistics
import time
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax

__all__ = ["TimingResult", "time_jitted", "wall_timer", "profile_trace"]


class TimingResult(NamedTuple):
    best: float
    median: float
    times: Sequence[float]
    compile_time: float

    def __str__(self):
        return (f"best {self.best * 1e3:.2f} ms, "
                f"median {self.median * 1e3:.2f} ms over "
                f"{len(self.times)} runs (compile {self.compile_time:.2f} s)")


def _block(x):
    jax.tree_util.tree_map(
        lambda leaf: leaf.block_until_ready()
        if hasattr(leaf, "block_until_ready") else leaf, x)
    return x


def time_jitted(fn: Callable, *args, repeats: int = 5,
                **kwargs) -> TimingResult:
    """Time a (jitted) function: one warm-up/compile call, then
    ``repeats`` timed calls with device synchronization."""
    t0 = time.perf_counter()
    _block(fn(*args, **kwargs))
    compile_time = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return TimingResult(best=min(times), median=statistics.median(times),
                        times=times, compile_time=compile_time)


@contextlib.contextmanager
def wall_timer(label: str = "", printer: Callable = print):
    """Context manager printing the wall time of its block."""
    t0 = time.perf_counter()
    yield
    printer(f"[{label or 'timer'}] {time.perf_counter() - t0:.4f} s")


@contextlib.contextmanager
def profile_trace(logdir: str, *, create_perfetto_link: bool = False):
    """``jax.profiler`` trace around a block; view with TensorBoard or
    Perfetto."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
