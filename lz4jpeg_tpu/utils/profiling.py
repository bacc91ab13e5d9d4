"""Profiling and honest device timing.

The reference's only "profiler" is ``clock()`` around child processes
(``Experiment/LZ4_sequential_experiment.c:99-116``).  The TPU equivalents
(SURVEY.md §5): ``jax.profiler`` traces for kernel-level inspection, and a
fenced wall-clock timer for end-to-end numbers.

``fenced`` exists because JAX dispatch is async and — on the experimental
remote-TPU platform used here — ``block_until_ready`` can return before
execution finishes.  Reducing every output to one scalar and pulling it to
the host is the only fence that cannot lie; its cost (one device→host
round trip) is charged to the measurement.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, List


def fenced(fn: Callable) -> Callable[..., float]:
    """Wrap ``fn`` so calling it executes fully and returns a checksum."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fenced_fn(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in leaves)

    return lambda *args: float(fenced_fn(*args))


def time_device(
    fn: Callable, *args, runs: int = 10, warmup: int = 2
) -> List[float]:
    """Fenced per-run wall times of a device computation."""
    f = fenced(fn)
    for _ in range(warmup):
        f(*args)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        f(*args)
        times.append(time.perf_counter() - t0)
    return times


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lz4jpeg_trace") -> Iterator[str]:
    """``jax.profiler`` trace scope; view with TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
