"""Count-Sketch / AMS: unbiased frequency estimates + second moment (F2).

Charikar, Chen, Farach-Colton (ICALP 2002) + Alon, Matias, Szegedy (STOC
1996).  The piece Count-Min cannot provide: CMS only OVER-estimates, while
Count-Sketch's signed counters give an UNBIASED point estimate (median of
d rows) and an F2 = sum_k f_k^2 estimate — the self-join / group-size
estimation primitive query planners use.

Guarantees (published):
- point query: |est - f_k| <= sqrt(F2 / w) with prob >= 1 - 2^-Omega(d)
  (per-row variance <= F2/w; median of d independent rows).
- F2 (AMS with averaging over w buckets per row): each row's
  sum-of-squares estimator is unbiased with Var <= 2 F2^2 / w; the median
  of d rows lands within eps = sqrt(8/w) of F2 with prob >= 1 - 2^-Omega(d).

Mergeable: the sketch is LINEAR in the input (signed sums), so merge is
element-wise addition — exact associativity/commutativity, any partition
order.  Row hashing is multiply-shift (Dietzfelbinger) over a precomputed
64-bit key hash, fully vectorized: two (d x batch) multiplies per update —
the bucket index and the +-1 sign come from SEPARATE multiply-shift
draws (independent (a, b) constants per row), as the published variance
bounds assume an independent sign hash; deriving the sign from a bit of
the bucket product would make the guarantees merely empirical.

Reference provenance: extends the reference's CMS family
(library/src/cm_sketch.c — same create/update/query/serialize surface)
with the signed-counter variant the reference lacks.
"""

from __future__ import annotations

import struct

import numpy as np

# CSK2: sign hash switched to an independent multiply-shift draw (CSK1
# derived it from a bit of the bucket product); estimates differ, so the
# magic bump keeps stale CSK1 partials from silently merging
_MAGIC = b"CSK2"

# fixed multiply-shift parameters per row (odd constants, splitmix-derived;
# deterministic across engines/partitions)
def _row_params(depth: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.empty(depth, np.uint64)
    b = np.empty(depth, np.uint64)
    v = (seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) % (1 << 64)
    for r in range(depth):
        v = (v * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a[r] = v | 1
        v = (v * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b[r] = v
    return a, b


class CountSketch:
    def __init__(self, width: int = 2048, depth: int = 5, seed: int = 7):
        if width < 2 or (width & (width - 1)):
            raise ValueError("width must be a power of two >= 2")
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.width = width
        self.depth = depth
        self.seed = seed
        self.table = np.zeros((depth, width), np.int64)
        self.n_items = 0
        self._a, self._b = _row_params(depth, seed)
        # independent constants for the sign hash (see _buckets_signs)
        self._sa, self._sb = _row_params(depth, seed + 0x5B5AD4F)
        self._wbits = int(width).bit_length() - 1

    def _buckets_signs(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(d, n) bucket indices and +-1 signs from 64-bit key hashes —
        two vectorized multiply-shifts per row.  The sign comes from the
        TOP BIT of its own multiply-shift draw (separate (a, b) constants),
        independent of the bucket draw: the Charikar/AMS variance analyses
        require the sign hash pairwise/4-wise independent of bucketing —
        adjacent bits of one product are not."""
        h = h.astype(np.uint64)
        with np.errstate(over="ignore"):
            g = self._a[:, None] * h[None, :] + self._b[:, None]  # (d, n)
            g2 = self._sa[:, None] * h[None, :] + self._sb[:, None]
        bucket = (g >> np.uint64(64 - self._wbits)).astype(np.int64)
        sign = ((g2 >> np.uint64(63)).astype(np.int64) * 2 - 1)
        return bucket, sign

    def update_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        if not len(h):
            return
        if counts is None:
            counts = np.ones(len(h), np.int64)
        bucket, sign = self._buckets_signs(h)
        # bincount-with-weights is the fast C scatter-add (np.add.at's
        # buffered fancy-index path is ~20x slower); float64 accumulation
        # is exact for |partial sums| < 2^53 — far beyond any batch
        vals = (sign * counts[None, :]).astype(np.float64)
        for r in range(self.depth):
            self.table[r] += np.bincount(
                bucket[r], weights=vals[r], minlength=self.width
            ).astype(np.int64)
        self.n_items += int(counts.sum())

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        """Unbiased point estimates (median over rows) for queried keys."""
        bucket, sign = self._buckets_signs(np.asarray(h))
        per_row = sign * np.take_along_axis(
            self.table, bucket, axis=1
        )  # (d, n)
        return np.median(per_row, axis=0)

    def f2_estimate(self) -> float:
        """AMS second-moment estimate: median over rows of sum of squared
        counters (each row unbiased, Var <= 2 F2^2 / width)."""
        per_row = (self.table.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(per_row))

    @property
    def f2_relative_bound(self) -> float:
        """Median-of-rows lands within this relative error w.h.p."""
        return np.sqrt(8.0 / self.width)

    def point_error_bound(self) -> float:
        """|est - f_k| <= sqrt(F2/width) w.h.p. (uses the sketch's own F2)."""
        return float(np.sqrt(self.f2_estimate() / self.width))

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.width, other.depth, other.seed) != (self.width, self.depth, self.seed):
            raise ValueError("incompatible CountSketch params")
        self.table += other.table
        self.n_items += other.n_items
        return self

    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<IIIq", self.width, self.depth, self.seed, self.n_items)
            + self.table.astype("<i8").tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountSketch":
        if buf[:4] != _MAGIC:
            raise ValueError("not a CountSketch buffer")
        w, d, seed, n = struct.unpack_from("<IIIq", buf, 4)
        sk = cls(w, d, seed)
        off = 4 + struct.calcsize("<IIIq")
        expect = d * w * 8
        if len(buf) != off + expect:
            raise ValueError("bad CountSketch buffer")
        sk.table = np.frombuffer(buf, "<i8", d * w, off).reshape(d, w).copy()
        sk.n_items = n
        return sk
