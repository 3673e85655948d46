"""Hierarchical profiling scopes — the reference's timer tree re-expressed.

pocket-etl wraps every stage in an EtlProfilingScope (EtlProfilingScope.java:47-128):
scopes nest on a per-thread stack, each records wall time on close, and child
timers roll up into their parent so a run emits one hierarchical timing tree
next to the counters (EtlMetrics.java:25-53). Here the driver-side orchestration
(batch apply phases, stream runs) is what nests — distributed work inside a
scope is timed as one unit, which is exactly how the reference's thread-pool
stages appeared to their parent scope.

Usage::

    prof = Profiler()
    with prof.scope("apply_batch"):
        with prof.scope("dlq_split"):
            ...
        with prof.scope("merge"):
            ...
    prof.tree()   # {"name": ..., "elapsed_sec": ..., "self_sec": ..., "children": [...]}
    prof.flat()   # {"apply_batch": 1.23, "apply_batch.merge": 1.0, ...}
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any


@dataclass
class _Scope:
    name: str
    started: float
    elapsed: float = 0.0
    children: list["_Scope"] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        child_total = sum(c.elapsed for c in self.children)
        return {
            "name": self.name,
            "elapsed_sec": round(self.elapsed, 6),
            # self time = elapsed minus children (the rollup invariant:
            # parent elapsed >= sum of child elapsed)
            "self_sec": round(max(0.0, self.elapsed - child_total), 6),
            "children": [c.to_dict() for c in self.children],
        }


class Profiler:
    """Collects a tree of named timing scopes (driver-side, single-threaded —
    one Profiler per run/batch, like one EtlMetrics per EtlStream run)."""

    def __init__(self) -> None:
        self._root = _Scope("root", time.time())
        self._stack = [self._root]

    @contextmanager
    def scope(self, name: str):
        s = _Scope(name, time.time())
        self._stack[-1].children.append(s)
        self._stack.append(s)
        try:
            yield s
        finally:
            s.elapsed = time.time() - s.started
            self._stack.pop()

    def tree(self) -> list[dict[str, Any]]:
        return [c.to_dict() for c in self._root.children]

    def flat(self) -> dict[str, float]:
        """Dotted-path → elapsed seconds (the reference's hierarchical metric
        names, EtlProfilingScope.java:96-104)."""
        out: dict[str, float] = {}

        def walk(s: _Scope, prefix: str) -> None:
            path = f"{prefix}.{s.name}" if prefix else s.name
            out[path] = round(s.elapsed, 6)
            for c in s.children:
                walk(c, path)

        for c in self._root.children:
            walk(c, "")
        return out
