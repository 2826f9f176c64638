"""Profiling / tracing utilities — first-class replacement for the
reference's ad-hoc hunter call-tracing and print-based stats (SURVEY.md §5
"Tracing / profiling"): jax.profiler device traces, a step timer with
percentile summaries, and parameter/FLOP accounting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with percentile summary (forces a sync via the
    caller handing back an output array)."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        if sync_array is not None:
            np.asarray(sync_array)  # device->host transfer == real completion
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> dict[str, float]:
        t = np.asarray(self.times)
        return {
            "n": int(t.size),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "mean_s": float(t.mean()),
        }


def count_params(tree) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(tree)))


def format_params(tree) -> str:
    n = count_params(tree)
    return f"{n / 1e6:.1f}M params"


def compiled_flops(fn, *args) -> float | None:
    """Total FLOPs of a jitted function from XLA's cost analysis (the
    analogue of the reference's thop hook, openaimodel.py:442-459)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None
