"""Tracing / profiling utilities (aux subsystem; the reference has none —
SURVEY.md §5 lists wall-clock prints only).

Provides:
  * `phase(name)` — context manager accumulating wall-time per phase
    (data / prepare / sample / postprocess), reported by `summary()`;
  * `trace(dir)` — wrapper around jax.profiler for on-device traces
    (view with TensorBoard / xprof);
  * `annotate(name)` — TraceAnnotation passthrough for kernel-level marks.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

_PHASES: Dict[str, float] = collections.defaultdict(float)
_COUNTS: Dict[str, int] = collections.defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PHASES[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def summary(reset: bool = False) -> Dict[str, dict]:
    out = {k: {'total_s': round(v, 4), 'count': _COUNTS[k],
               'mean_s': round(v / max(_COUNTS[k], 1), 4)}
           for k, v in _PHASES.items()}
    if reset:
        _PHASES.clear()
        _COUNTS.clear()
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
