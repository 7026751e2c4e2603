"""Host-side stage timers (reference parity: DOLFIN ``Timer``/``list_timings``
+ PETSc ``-log_view``, SURVEY.md section 5.1).

jit boundaries are the natural timing units on TPU; ``Timer`` wraps them with
``block_until_ready`` semantics left to the caller (pass device arrays through
``jax.block_until_ready`` before stopping if exact device time is wanted).
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Timings:
    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> str:
        """Formatted table mirroring DOLFIN ``list_timings``."""
        lines = [f"{'stage':<32} {'calls':>6} {'total s':>10} {'avg ms':>10}"]
        for name in sorted(self.total):
            t, c = self.total[name], self.count[name]
            lines.append(f"{name:<32} {c:>6} {t:>10.3f} {1e3 * t / c:>10.2f}")
        return "\n".join(lines)


GLOBAL_TIMINGS = Timings()


@contextmanager
def device_trace(trace_dir: str | None):
    """Capture a ``jax.profiler`` device trace around a code region.

    The TPU-native analogue of PETSc ``-log_view`` stage logs / DOLFIN's
    timed regions at DEVICE granularity: per-HLO timings, HBM traffic and
    fusion boundaries, viewable in TensorBoard/Perfetto (reference parity:
    SURVEY.md section 5.1).  No-op when ``trace_dir`` is falsy, so callers
    can thread an optional CLI flag straight through:

        with device_trace(args.trace):
            solver.solve(...)
    """
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
