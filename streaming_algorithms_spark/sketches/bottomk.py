"""Bottom-k sample / KMV distinct sketch — mergeable, deterministic sampling.

A uniform sample over *distinct* keys that merges exactly: every key gets a
deterministic tag u = xxh64(key)/2^64 in [0,1); the sketch keeps the k
smallest tags (with their keys).  Union of bottom-k sets -> bottom-k of the
union, so merge is associative/commutative and byte-identical regardless of
partition order (same property as HLL registers).

Bonus: the k-th minimum value estimates distinct count as (k-1)/u_(k)
(Bar-Yossef et al. 2002, "Counting distinct elements in a data stream"),
relative error ~1/sqrt(k-2).

This is the engine's distributed sampling primitive (SURVEY §2.7 row
"filter/sampling"): unlike df.sample it is content-deterministic (stable
across retries/stragglers — important for reproducible pipelines) and
samples distinct keys rather than rows.
"""

from __future__ import annotations

import math

import numpy as np

from .xxhash import xxh64_batch

_U64_MAX = float(2**64)


class BottomKSample:
    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.tags = np.empty(0, np.uint64)   # sorted ascending
        self.keys: list[bytes] = []          # aligned with tags

    def update_batch(self, keys) -> None:
        keys = list(keys)
        if not keys:
            return
        h = xxh64_batch(keys)
        # batch-local dedup + bottom-k before the merge
        order = np.argsort(h, kind="stable")
        h_sorted = h[order]
        uniq_mask = np.ones(h_sorted.size, bool)
        uniq_mask[1:] = h_sorted[1:] != h_sorted[:-1]
        sel = order[uniq_mask][: self.k]
        sel_sorted = sel[np.argsort(h[sel], kind="stable")]
        self._merge_arrays(h[sel_sorted], [keys[i] for i in sel_sorted])

    def _merge_arrays(self, tags: np.ndarray, keys: list) -> None:
        if self.tags.size == 0:
            self.tags = tags[: self.k].copy()
            self.keys = keys[: self.k]
            return
        all_tags = np.concatenate([self.tags, tags])
        all_keys = self.keys + keys
        order = np.argsort(all_tags, kind="stable")
        sorted_tags = all_tags[order]
        uniq = np.ones(sorted_tags.size, bool)
        uniq[1:] = sorted_tags[1:] != sorted_tags[:-1]
        keep = order[uniq][: self.k]
        keep = keep[np.argsort(all_tags[keep], kind="stable")]
        self.tags = all_tags[keep]
        self.keys = [all_keys[i] for i in keep]

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if self.k != other.k:
            raise ValueError("bottom-k size mismatch")
        self._merge_arrays(other.tags, other.keys)
        return self

    def sample(self) -> list:
        return list(self.keys)

    def distinct_estimate(self) -> float:
        """KMV estimator; exact when fewer than k distinct keys seen."""
        if self.tags.size < self.k:
            return float(self.tags.size)
        u_k = float(self.tags[-1]) / _U64_MAX
        return (self.k - 1) / u_k

    @property
    def relative_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 2)

    # LE layout: u32 k, u32 n, u64 tags, then per key u32 len + bytes
    def to_bytes(self) -> bytes:
        parts = [np.array([self.k, len(self.keys)], "<u4").tobytes(),
                 self.tags.astype("<u8").tobytes()]
        for key in self.keys:
            parts.append(np.array([len(key)], "<u4").tobytes())
            parts.append(key)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BottomKSample":
        k, n = np.frombuffer(buf[:8], "<u4")
        sk = cls(int(k))
        sk.tags = np.frombuffer(buf[8 : 8 + 8 * int(n)], "<u8").copy()
        off = 8 + 8 * int(n)
        keys = []
        for _ in range(int(n)):
            ln = int(np.frombuffer(buf[off : off + 4], "<u4")[0])
            off += 4
            keys.append(bytes(buf[off : off + ln]))
            off += ln
        if off != len(buf):
            raise ValueError("bad bottom-k buffer")
        sk.keys = keys
        return sk
