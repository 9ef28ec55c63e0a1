"""Bloom filter — mergeable set-membership sketch.

Not in the reference C library; BASELINE.json lists Bloom among the required
primitives ("cuckoo/Bloom membership filters").  At 100 TB scale a Bloom
filter built over a dimension key set replaces an anti-/semi-join probe:
ship the filter bytes (broadcast) instead of shuffling the fact table.

Standard construction: m bits, k hash functions realized via double hashing
h_i = h1 + i*h2 (Kirsch & Mitzenmacher 2006 — same trick the reference uses
for CMS rows, library/src/cm_sketch.c:73-78) from one XXH64 split into two
32-bit halves.  False positive rate ~ (1 - e^{-kn/m})^k; no false negatives.
Merge = bitwise OR (commutative, idempotent monoid).
"""

from __future__ import annotations

import math

import numpy as np

from .xxhash import xxh64_batch


class BloomFilter:
    def __init__(self, capacity: int, fpr: float = 1e-6, *,
                 m_bits: int = None, k: int = None):
        if m_bits is None or k is None:
            if capacity < 1 or not (0 < fpr < 1):
                raise ValueError("bad capacity/fpr")
            m_bits = int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2)))
            k = max(1, round(m_bits / capacity * math.log(2)))
        self.capacity = capacity
        self.fpr = fpr
        self.m_bits = m_bits
        self.k = k
        self.bits = np.zeros((m_bits + 7) // 8, np.uint8)
        self.n_added = 0

    def _positions(self, keys) -> np.ndarray:
        """(k, n) bit positions."""
        h = xxh64_batch(keys)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h >> np.uint64(32)).astype(np.uint64)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m_bits)).astype(np.int64)

    def update_batch(self, keys) -> None:
        keys = list(keys)
        if not keys:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        self.n_added += len(keys)

    def contains_batch(self, keys) -> np.ndarray:
        keys = list(keys)
        if not keys:
            return np.zeros(0, bool)
        pos = self._positions(keys)
        set_ = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return set_.all(axis=0).astype(bool)

    def contains(self, key: bytes) -> bool:
        return bool(self.contains_batch([key])[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("Bloom shape mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    # LE layout: u64 m_bits, u32 k, u64 n_added, bit bytes
    def to_bytes(self) -> bytes:
        return (
            np.array([self.m_bits], "<u8").tobytes()
            + np.array([self.k], "<u4").tobytes()
            + np.array([self.n_added], "<u8").tobytes()
            + self.bits.tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        m_bits = int(np.frombuffer(buf[:8], "<u8")[0])
        k = int(np.frombuffer(buf[8:12], "<u4")[0])
        n_added = int(np.frombuffer(buf[12:20], "<u8")[0])
        sk = cls(capacity=max(1, n_added), m_bits=m_bits, k=k)
        if len(buf) != 20 + (m_bits + 7) // 8:
            raise ValueError("bad bloom buffer")
        sk.bits = np.frombuffer(buf[20:], np.uint8).copy()
        sk.n_added = n_added
        return sk
