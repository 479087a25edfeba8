"""Wall-clock timing, the analogue of `lego::Timer` (src/lego/base/timer.h:8-23).

For device work the plain wall clock lies (JAX dispatch is async), so `Timer`
optionally blocks on a pytree of arrays before reading the clock, and
`CumulativeTimer` aggregates named sections the way the reference accumulates
`t_hessian_cost_` across solver iterations (problem.cpp:273-358)."""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


def _block(tree: Any) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


class Timer:
    def __init__(self):
        self.tic()

    def tic(self) -> None:
        self._start = time.perf_counter()

    def toc(self, block_on: Any = None) -> float:
        """Elapsed milliseconds since tic(); optionally sync on device arrays."""
        if block_on is not None:
            _block(block_on)
        return (time.perf_counter() - self._start) * 1e3


class CumulativeTimer:
    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, ms: float) -> None:
        self._totals[name] += ms
        self._counts[name] += 1

    def section(self, name: str, block_on: Any = None):
        return _Section(self, name, block_on)

    def total_ms(self, name: str) -> float:
        return self._totals[name]

    def mean_ms(self, name: str) -> float:
        return self._totals[name] / max(1, self._counts[name])

    def report(self) -> str:
        lines = [
            f"{name}: total={self._totals[name]:.2f} ms, mean={self.mean_ms(name):.3f} ms, n={self._counts[name]}"
            for name in sorted(self._totals)
        ]
        return "\n".join(lines)


class _Section:
    def __init__(self, parent: CumulativeTimer, name: str, block_on: Any):
        self._parent, self._name, self._block_on = parent, name, block_on

    def __enter__(self):
        self._t = Timer()
        return self

    def __exit__(self, *exc):
        self._parent.add(self._name, self._t.toc(self._block_on))
        return False
