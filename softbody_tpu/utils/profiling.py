"""Profiling / observability.

The reference's only observability is tqdm around the frame loop and print
statements (SURVEY.md §5).  Here: wall-clock step timers with
particle-steps/sec counters (the BASELINE.md metric), structured run metrics,
and a jax.profiler trace context.

IMPORTANT measurement caveat for tunnel-attached TPUs (see PERF_NOTES.md):
execution is async until the first device→host transfer; `sync_point()` forces
sync mode so subsequent wall-clock timings are honest.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import numpy as np
import jax


def sync_point():
    """Force one tiny D2H transfer; afterwards wall-clock timings are real."""
    np.asarray(jax.numpy.zeros(1))


class Throughput:
    """Particle-steps/sec counter around episode executions."""

    def __init__(self, n_particles: int):
        self.n = n_particles
        self.records = []

    @contextlib.contextmanager
    def measure(self, n_steps: int, label: str = "episode"):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.records.append({
            "label": label,
            "steps": n_steps,
            "seconds": dt,
            "particle_steps_per_sec": self.n * n_steps / dt,
        })

    @property
    def best(self):
        return max((r["particle_steps_per_sec"] for r in self.records), default=0.0)

    def dump(self, path):
        Path(path).write_text(json.dumps(self.records, indent=1))


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Scan-amortized step timing: the only honest method behind the tunnel."""

    @staticmethod
    def time_step_fn(step_fn, state, iters: int = 50, **kw):
        """step_fn(state) -> state.  Returns seconds/step (compile excluded)."""
        import jax.numpy as jnp

        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step_fn(c), None), s, None, length=iters)[0]

        jax.block_until_ready(run(state))
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        return (time.perf_counter() - t0) / iters
