"""HyperLogLog — dense, mergeable, numpy-vectorized.

The reference C library has no HLL; its production workload uses an external
Lua ``hyperloglog`` module for duplicate-percentage monitoring
(lua_binding/luasandbox/sandboxes/heka/analysis/heka_message_monitor.lua:506-512).
BASELINE.json lists HLL as a required extension with relative standard error
1.04/sqrt(m).

Implementation: Flajolet et al. 2007 with 64-bit hashing (XXH64), m = 2^p
uint8 registers, linear-counting small-range correction (no large-range
correction needed with a 64-bit hash).  Merge = element-wise register max —
a commutative, idempotent monoid, so partition order and repartitioning
cannot change the merged sketch bytes.
"""

from __future__ import annotations

import math

import numpy as np

from .xxhash import xxh64_batch


def _rho64(w: np.ndarray, meaningful_bits: int) -> np.ndarray:
    """HLL rho over 64-bit words whose low (64 - meaningful_bits) bits are
    guaranteed zero: position of the first 1-bit counting from the MSB
    (1-based); all-zero words -> meaningful_bits + 1.  Vectorized.

    bit_length via float64 log2 is unsafe above 2^53, so use a 6-step binary
    search instead."""
    w = w.astype(np.uint64)
    rho = np.full(w.shape, meaningful_bits + 1, np.uint8)
    nz = w != 0
    if nz.any():
        v = w[nz]
        bl = np.zeros(v.shape, np.int64)  # ends as bit_length - 1
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            v = np.where(big, v >> np.uint64(shift), v)
        rho[nz] = (64 - bl).astype(np.uint8)  # leading_zeros + 1 = 64 - bl
    return rho


class HyperLogLog:
    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4,18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def _alpha(self) -> float:
        m = self.m
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1 + 1.079 / m)

    def add_hashes(self, h: np.ndarray) -> None:
        """Update from precomputed 64-bit hashes (vectorized)."""
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        tail = h << np.uint64(self.p)  # numpy uint64 shifts wrap to 64 bits
        rho = _rho64(tail, 64 - self.p)
        np.maximum.at(self.registers, idx, rho)

    def update_batch(self, keys) -> None:
        """keys: iterable of bytes."""
        if len(keys) == 0:
            return
        self.add_hashes(xxh64_batch(keys))

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        raw = self._alpha() * self.m * self.m / np.sum(np.exp2(-regs))
        if raw <= 2.5 * self.m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return self.m * math.log(self.m / zeros)
        return float(raw)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("HLL precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # Wire layout, auto-selected per sketch (decisive at scale: hierarchical
    # / per-host rollups carry one sketch per group, and most groups are
    # small — dense p=14 is 16 KB/group regardless of content, sparse is
    # ~5 B per set register):
    #   dense : u8 p, then m register bytes                  (byte0 < 0x80)
    #   sparse: u8 (0x80|p), u32 count, count x u32 ascending register
    #           indices, count x u8 values                   (byte0 >= 0x80)
    # p <= 18 < 0x80, so bit 7 of byte 0 is free to flag sparse; dense
    # buffers from older versions parse unchanged.  Sparse emission sorts
    # indices, so equal-content sketches still serialize byte-identically
    # (the merge-order-free property tests rely on that).
    _SPARSE_FLAG = 0x80

    def to_bytes(self) -> bytes:
        nz = np.flatnonzero(self.registers)
        if 5 + 5 * nz.size < 1 + self.m:
            return (
                bytes([self._SPARSE_FLAG | self.p])
                + np.array([nz.size], "<u4").tobytes()
                + nz.astype("<u4").tobytes()
                + self.registers[nz].tobytes()
            )
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        b0 = buf[0]
        if b0 & cls._SPARSE_FLAG:
            sk = cls(b0 & 0x7F)
            n = int(np.frombuffer(buf, "<u4", 1, 1)[0])
            if len(buf) != 5 + 5 * n:
                raise ValueError("bad sparse HLL buffer")
            idx = np.frombuffer(buf, "<u4", n, 5).astype(np.int64)
            if n and (idx[-1] >= sk.m or np.any(np.diff(idx) <= 0)):
                raise ValueError("bad sparse HLL indices")
            sk.registers[idx] = np.frombuffer(buf, np.uint8, n, 5 + 4 * n)
            return sk
        sk = cls(b0)
        if len(buf) != 1 + sk.m:
            raise ValueError("bad HLL buffer")
        sk.registers = np.frombuffer(buf[1:], np.uint8).copy()
        return sk
