"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — mergeable.

The reference's P² quantile (library/src/p2.c) is not mergeable, so the
distributed quantile path uses KLL, as called for by BASELINE.json
("t-digest/KLL rank error within compression guarantee").

Design follows the published algorithm / Apache DataSketches conventions:
a stack of compactors; level l items carry weight 2^l; when total size
exceeds capacity the lowest full level is sorted and its odd- or even-indexed
half (random coin) is promoted.  Normalized rank error for k=200 is ~1.65%
at 99% confidence (DataSketches published table); we assert a conservative
2% in tests.

Compaction coins are derived from the sketch's own state (seed, level,
total weight, buffer size) via a splitmix64 mix rather than a consumed RNG
stream: deterministic for a given input stream (so checkpoint/resume and the
oracle gates are reproducible), and a deserialized sketch never replays
coins it had already consumed.  Cross-partition decorrelation is NOT a
property of the mix alone — two partials with the same seed over equal-sized
streams flip identical coins — so distributed callers must salt the seed
per partial (kll_quantiles mixes the Spark partition id in); with distinct
seeds the first mix term differs and the coin sequences diverge.  Merge order
may legitimately change the bytes (unlike the linear sketches) — the
guarantee preserved under merge is the rank-error bound, which is what the
property tests assert (SURVEY §7 "hard parts").
"""

from __future__ import annotations

import math

import numpy as np

_C = 2.0 / 3.0  # capacity decay per level below the top


class KLL:
    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self.compactors: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0  # total weight of items seen

    # -- capacity ------------------------------------------------------------

    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        depth = height - 1 - level
        return max(2, int(math.ceil(self.k * (_C ** depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(l) for l in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(c.size for c in self.compactors)

    # -- update / compact ----------------------------------------------------

    def update_batch(self, xs) -> None:
        xs = np.asarray(xs, np.float64)
        xs = xs[np.isfinite(xs)]
        if xs.size == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], xs])
        self.n += xs.size
        self._compress()

    def update(self, x: float) -> None:
        self.update_batch([x])

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for level in range(len(self.compactors)):
                if self.compactors[level].size >= self._capacity(level):
                    self._compact_level(level)
                    break

    def _coin(self, level: int, size: int) -> int:
        """splitmix64 of (seed, level, n, size) — see the module docstring."""
        x = (self.seed * 0x9E3779B97F4A7C15 + level * 0xBF58476D1CE4E5B9
             + self.n * 0x94D049BB133111EB + size + 1) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        return int(x & 1)

    def _compact_level(self, level: int) -> None:
        if level + 1 >= len(self.compactors):
            self.compactors.append(np.empty(0, np.float64))
        c = np.sort(self.compactors[level])
        odd = c.size % 2
        if odd:
            # keep one leftover at this level so weights stay exact
            keep, c = c[:1], c[1:]
        else:
            keep = np.empty(0, np.float64)
        offset = self._coin(level, c.size)
        promoted = c[offset::2]
        self.compactors[level] = keep
        self.compactors[level + 1] = np.concatenate(
            [self.compactors[level + 1], promoted]
        )

    # -- merge ---------------------------------------------------------------

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("KLL k mismatch")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, np.float64))
        for level, c in enumerate(other.compactors):
            if c.size:
                self.compactors[level] = np.concatenate(
                    [self.compactors[level], c]
                )
        self.n += other.n
        self._compress()
        return self

    # -- query ---------------------------------------------------------------

    def _weighted(self):
        vals, weights = [], []
        for level, c in enumerate(self.compactors):
            if c.size:
                vals.append(c)
                weights.append(np.full(c.size, 1 << level, np.int64))
        if not vals:
            return None, None
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v is None:
            return math.nan
        cw = np.cumsum(w)
        target = q * cw[-1]
        idx = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, x: float) -> float:
        """Normalized rank of x (fraction of weight <= x)."""
        v, w = self._weighted()
        if v is None:
            return math.nan
        return float(w[v <= x].sum() / w.sum())

    # -- serialization: LE u32 k, u64 seed, u64 n, u32 levels, per level u32
    #    count then f64 values
    def to_bytes(self) -> bytes:
        parts = [
            np.array([self.k], "<u4").tobytes(),
            np.array([self.seed, self.n], "<u8").tobytes(),
            np.array([len(self.compactors)], "<u4").tobytes(),
        ]
        for c in self.compactors:
            parts.append(np.array([c.size], "<u4").tobytes())
            parts.append(c.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        k = int(np.frombuffer(buf[:4], "<u4")[0])
        seed, n = np.frombuffer(buf[4:20], "<u8")
        levels = int(np.frombuffer(buf[20:24], "<u4")[0])
        sk = cls(k, int(seed))
        sk.n = int(n)
        sk.compactors = []
        off = 24
        for _ in range(levels):
            cnt = int(np.frombuffer(buf[off : off + 4], "<u4")[0])
            off += 4
            sk.compactors.append(
                np.frombuffer(buf[off : off + 8 * cnt], "<f8").copy()
            )
            off += 8 * cnt
        if off != len(buf):
            raise ValueError("bad KLL buffer")
        return sk
