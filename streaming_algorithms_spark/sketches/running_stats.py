"""Welford running stats — exact, mergeable.

Reference semantics (library/src/running_stats.c:15-91):
- add: mean += (x - mean)/n; sum(M2) += (x - old_mean)(x - new_mean)
- non-finite inputs (NaN/±Inf) are silently skipped (running_stats.c:25)
- variance = M2/(n-1) (0 if n<2); sd = sqrt(var); usd = sqrt(M2/n)
- serialized as 3 little-endian f64 (count, mean, sum) (running_stats.c:60-72)

The reference has no merge; we add the exact pairwise combine of
Chan, Golub & LeVeque (1979), which makes the structure a commutative
monoid suitable for per-partition partials.
"""

from __future__ import annotations

import math

import numpy as np


class RunningStats:
    __slots__ = ("count", "mean", "sum")

    def __init__(self, count: float = 0.0, mean: float = 0.0, m2: float = 0.0):
        self.count = float(count)
        self.mean = float(mean)
        self.sum = float(m2)  # M2, named `sum` to mirror running_stats.h:18

    def add(self, x: float) -> float:
        if not math.isfinite(x):
            return self.mean
        self.count += 1
        old = self.mean
        self.mean += (x - old) / self.count
        self.sum += (x - old) * (x - self.mean)
        return self.mean

    def update_batch(self, xs) -> None:
        """Vectorized: one-pass numpy moments + exact Chan combine."""
        xs = np.asarray(xs, np.float64)
        xs = xs[np.isfinite(xs)]
        n = xs.size
        if n == 0:
            return
        mean = float(xs.mean())
        m2 = float(((xs - mean) ** 2).sum())
        self.merge(RunningStats(n, mean, m2))

    def merge(self, other: "RunningStats") -> "RunningStats":
        na, nb = self.count, other.count
        if nb == 0:
            return self
        if na == 0:
            self.count, self.mean, self.sum = nb, other.mean, other.sum
            return self
        n = na + nb
        delta = other.mean - self.mean
        self.mean += delta * nb / n
        self.sum += other.sum + delta * delta * na * nb / n
        self.count = n
        return self

    def variance(self) -> float:
        return self.sum / (self.count - 1) if self.count > 1 else 0.0

    def sd(self) -> float:
        return math.sqrt(self.variance())

    def usd(self) -> float:
        """Uncorrected (population) standard deviation (running_stats.c:53-57)."""
        return math.sqrt(self.sum / self.count) if self.count > 0 else 0.0

    def to_bytes(self) -> bytes:
        return np.array([self.count, self.mean, self.sum], "<f8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "RunningStats":
        if len(buf) != 24:
            raise ValueError("bad running_stats buffer")
        c, m, s = np.frombuffer(buf, "<f8")
        if c < 0:
            raise ValueError("negative count")  # running_stats.c rc 2
        return cls(c, m, s)
