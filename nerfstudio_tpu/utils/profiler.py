"""Profiling (reference: nerfstudio/utils/profiler.py, 213 LoC).

Two levels, mirroring the reference:
  * "basic": @time_function records running-average wall times, printed at
    exit (reference profiler.py:60-130).
  * "xla": jax.profiler traces around selected steps -> perfetto/chrome trace
    (the torch.profiler replacement, reference profiler.py:133-178).
"""

from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

_PROFILER_ENABLED = False
_STATS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def enable_profiler() -> None:
    global _PROFILER_ENABLED
    _PROFILER_ENABLED = True


def time_function(fn):
    """Decorator recording running-average wall time (reference :60-96)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if not _PROFILER_ENABLED:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        s = _STATS[fn.__qualname__]
        s[0] += dt
        s[1] += 1
        return out

    return wrapped


def flush_profiler() -> None:
    """Print stats sorted by total time (reference :118-130)."""
    if not _STATS:
        return
    print("\n[profiler] avg times:")
    for name, (total, count) in sorted(_STATS.items(), key=lambda kv: -kv[1][0]):
        print(f"  {name}: {total / max(count, 1) * 1e3:.2f} ms x {count}")


atexit.register(flush_profiler)


class XlaProfiler:
    """Step-gated jax.profiler trace (reference PytorchProfiler :133-178)."""

    def __init__(self, output_dir: Path, trace_steps=(12, 17)):
        self.output_dir = Path(output_dir) / "profiler_traces"
        self.trace_steps = set(trace_steps)
        self._active = False

    def step_start(self, step: int) -> None:
        import jax

        if step in self.trace_steps and not self._active:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.output_dir))
            self._active = True

    def step_end(self, step: int) -> None:
        import jax

        if self._active and step in self.trace_steps:
            jax.profiler.stop_trace()
            self._active = False
