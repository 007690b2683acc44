"""Hierarchical timing scopes — the reference's TimingTree equivalent.

The reference wraps prover phases in plonky2 `TimingTree`/`timed!` scopes
printed via env_logger (SURVEY.md §5).  Same idea: nested scopes, printed
on demand; enabled with env PLONKY2_BN254_TPU_TIMING=1 or explicitly.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import List, Optional


class TimingTree:
    def __init__(self, enabled: Optional[bool] = None):
        if enabled is None:
            enabled = os.environ.get("PLONKY2_BN254_TPU_TIMING", "0") == "1"
        self.enabled = enabled
        self.records: List[tuple] = []  # (depth, name, seconds)
        self._depth = 0

    @contextmanager
    def scope(self, name: str):
        depth = self._depth
        self._depth += 1
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._depth = depth
            self.records.append((depth, name, time.perf_counter() - t0))

    def print(self, out=None):
        lines = []
        for depth, name, secs in self.records:
            lines.append(f"{'  ' * depth}{secs:8.3f}s  {name}")
        text = "\n".join(lines)
        if out is not None:
            out.write(text + "\n")
        else:
            print(text)
        return text

    def total(self, name: str) -> float:
        return sum(s for _, n, s in self.records if n == name)


_NULL = TimingTree(enabled=False)


def get(timing: Optional[TimingTree]) -> TimingTree:
    return timing if timing is not None else _NULL
