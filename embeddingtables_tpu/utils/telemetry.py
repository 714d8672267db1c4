"""Telemetry: phase hooks, step timing, bandwidth accounting, profiler traces.

The reference's entire observability surface is one callback slot fired
between the index and update phases of the ensemble update
(`/root/reference/src/sparseupdate.jl:208,214`). This module keeps that hook
style (`phase(...)` + registered callbacks) and adds what a production TPU
deployment needs (SURVEY.md §5 TPU-build notes):

  - `Telemetry`: counters + per-phase wall timings + effective-bandwidth
    records, cheap enough to leave on;
  - `phase(name)`: context manager that times a phase and fires callbacks
    (the `telemetry_cb` analog — `ensemble_sgd_update` fires one);
  - `trace_profile(dir)`: context manager around `jax.profiler` for on-chip
    traces (view with TensorBoard / xprof).

Device-time caveat: wall timings include host/dispatch overhead; for
kernel-level truth use `trace_profile` and read the trace.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax


@dataclasses.dataclass
class PhaseStat:
    count: int = 0
    total_s: float = 0.0
    bytes: int = 0

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)

    @property
    def gbps(self) -> float:
        return self.bytes / max(self.total_s, 1e-12) / 1e9


class Telemetry:
    """Phase timings, counters, and effective-bandwidth accounting."""

    def __init__(self):
        self.phases: Dict[str, PhaseStat] = defaultdict(PhaseStat)
        self.counters: Dict[str, float] = defaultdict(float)
        self.callbacks: List[Callable[[str, str], None]] = []

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def record_bytes(self, phase_name: str, nbytes: int) -> None:
        self.phases[phase_name].bytes += nbytes

    def on_phase(self, cb: Callable[[str, str], None]) -> None:
        """Register `cb(phase_name, event)` with event in {"start", "end"} —
        the reference's `telemetry_cb` slot, generalized."""
        self.callbacks.append(cb)

    @contextlib.contextmanager
    def phase(self, name: str, nbytes: int = 0, sync: bool = False):
        for cb in self.callbacks:
            cb(name, "start")
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if sync:
                # Fence outstanding device work so the timing is honest.
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            st = self.phases[name]
            st.count += 1
            st.total_s += dt
            if nbytes:
                st.bytes += nbytes
            for cb in self.callbacks:
                cb(name, "end")

    def summary(self) -> str:
        lines = []
        for name in sorted(self.phases):
            st = self.phases[name]
            bw = f" {st.gbps:8.1f} GB/s" if st.bytes else ""
            lines.append(f"{name:28s} n={st.count:<6d} mean={st.mean_s*1e3:8.3f} ms{bw}")
        for name in sorted(self.counters):
            lines.append(f"{name:28s} {self.counters[name]:g}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.phases.clear()
        self.counters.clear()


_GLOBAL = Telemetry()


def get_telemetry() -> Telemetry:
    return _GLOBAL


def set_telemetry(t: Telemetry) -> Telemetry:
    global _GLOBAL
    old, _GLOBAL = _GLOBAL, t
    return old


def phase(name: str, nbytes: int = 0, sync: bool = False):
    """Module-level shortcut: `with telemetry.phase("update"): ...`."""
    return _GLOBAL.phase(name, nbytes=nbytes, sync=sync)


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """jax.profiler trace around a block (TensorBoard-viewable).

    May be unsupported on remote-tunnel backends; degrades to a no-op with a
    recorded counter rather than failing the run.
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        _GLOBAL.count("trace_profile.unsupported")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                _GLOBAL.count("trace_profile.stop_failed")
