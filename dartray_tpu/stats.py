"""Render statistics / observability (lib/core/stats.dart:541-605 analog).

The reference inlines ~90 static counter hooks in its hot loops; on TPU the
hot loops are jit-compiled, so per-event host callbacks are impossible.
Instead: exact host-side accounting of issued wavefront work (every wave has
a static shape, so query counts are exact, not sampled), wall-clock timings
per phase, and optional device-derived counts (live-lane fractions) fetched
at wave granularity.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict


class RenderStats:
    """Counters + phase timings; render entry points fill it when passed."""

    def __init__(self):
        self.counters: Dict[str, float] = {}
        self.timings: Dict[str, float] = {}

    def add(self, name: str, n=1):
        self.counters[name] = self.counters.get(name, 0) + n

    @contextmanager
    def time(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.time() - t0)

    def summary(self) -> str:
        lines = ["render stats:"]
        for k in sorted(self.counters):
            v = self.counters[k]
            lines.append(f"  {k:<28} {v:,.0f}")
        for k in sorted(self.timings):
            lines.append(f"  {k:<28} {self.timings[k]:.2f}s")
        c = self.counters
        if "rays/traversal_queries" in c and "time/render" in {
                k for k in self.timings}:
            t = max(self.timings["time/render"], 1e-9)
            lines.append(f"  {'rays_per_second':<28} "
                         f"{c['rays/traversal_queries'] / t:,.0f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {"counters": dict(self.counters),
                "timings": dict(self.timings)}
