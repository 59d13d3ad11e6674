"""Profiling and tracing utilities.

The reference's observability is ad-hoc timeit cells
(reference: test/time_profiling.ipynb) and verbose prints; here:
per-stage wall timers that block on device completion, plus a thin wrapper
over jax.profiler for capturing device traces viewable in Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax

__all__ = ["StageTimer", "trace", "enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA executables across processes.

    The flagship 5-scale pyramid program takes minutes to compile on a
    tunneled TPU; with the persistent cache, reruns of bench.py / the CLI
    for an already-seen (shape, config) are seconds. Safe on any backend.

    Defaults to ``~/.cache/ica_tpu_jax`` and is a no-op when the user has
    already configured a cache dir (via JAX_COMPILATION_CACHE_DIR or
    jax.config) so we never clobber an existing setup.
    """
    if jax.config.jax_compilation_cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"):
        return
    if jax.default_backend() != "tpu":
        # TPU-only: XLA:CPU caches executables AOT-compiled against the
        # exact host CPU feature set; reloading them on a machine with
        # different features SIGILLs/segfaults the process (observed: a
        # cache populated on one round's node crashed the next round's
        # pytest at backend.deserialize_executable). CPU compiles are
        # seconds anyway — only the minutes-long tunneled TPU compiles
        # are worth persisting, and TPU executables carry no host-CPU
        # feature dependence.
        return
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "ica_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class StageTimer:
    """Accumulating wall-clock timer keyed by stage name.

    Blocks on device work (jax.block_until_ready on the value returned by
    the stage) so times are real, not dispatch latencies::

        timer = StageTimer()
        with timer("warp"):
            iw = warp_fn(...)           # timer blocks at scope exit
        print(timer.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._live = []

    @contextlib.contextmanager
    def __call__(self, name: str, value=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._live:
                jax.block_until_ready(self._live.pop())
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def observe(self, value):
        """Register the stage's output so the timer can block on it."""
        self._live.append(value)
        return value

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        width = max((len(k) for k in self.totals), default=4)
        lines = [f"{k:<{width}}  {v * 1e3:10.3f} ms  x{self.counts[k]}"
                 for k, v in rows]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ica-trace"):
    """Capture a jax.profiler device trace around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
