"""Profiling + structured metrics (SURVEY.md section 5: the reference has only
vestigial tracing -- ark-std print-trace is enabled but never used; criterion
is the only measurement surface).

Provides:
  - ``StageTimer``: wall-clock stage breakdown with device sync, used by the
    prover and bench harness (per-stage prove timing is a BASELINE.json
    requirement),
  - ``trace``: context manager bridging to jax.profiler for TPU traces,
  - ``Metrics``: append-only structured metric records with JSON export.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


def _sync(x):
    if x is not None:
        try:
            jax.block_until_ready(x)
        except Exception:
            pass


class StageTimer:
    """Accumulates named stage wall-clock times (device-synced)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync_result=None):
        if not self.enabled:
            yield {}
            return
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            _sync(holder.get("out", sync_result))
            dt = time.time() - t0
            if name not in self.stages:
                self._order.append(name)
                self.stages[name] = 0.0
            self.stages[name] += dt

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"  {n:<24s} {self.stages[n]*1e3:9.1f} ms  "
                 f"({100*self.stages[n]/total if total else 0:5.1f}%)"
                 for n in self._order]
        lines.append(f"  {'total':<24s} {total*1e3:9.1f} ms")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)


@contextlib.contextmanager
def trace(dirname: Optional[str] = None):
    """jax.profiler trace wrapper (view with TensorBoard / xprof)."""
    if dirname is None:
        yield
        return
    with jax.profiler.trace(dirname):
        yield


@dataclass
class Metrics:
    """Structured metric sink (points/s, butterflies/s, scaling efficiency)."""

    records: List[dict] = field(default_factory=list)

    def record(self, name: str, value: float, unit: str = "", **tags):
        self.records.append({"name": name, "value": float(value),
                             "unit": unit, "ts": time.time(), **tags})

    def dump(self, path: str):
        with open(path, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")

    def summary(self) -> str:
        return "\n".join(f"  {r['name']:<32s} {r['value']:>14,.1f} {r['unit']}"
                         for r in self.records)
