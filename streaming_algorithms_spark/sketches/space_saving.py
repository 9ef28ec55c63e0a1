"""Space-Saving heavy hitters (Metwally, Agrawal & El Abbadi 2005) — the
bounded-memory top-k sketch behind the reference workload's `sparse` subtype
(heka_message_monitor.lua:562-590: per-value weights, decrement-all on
overflow, max 255 values — a decayed variant of the same idea).

Guarantees with k counters over N items: every item with true count > N/k is
tracked, and each tracked count overestimates by at most its stored error
(count - error <= true <= count).  Merge: sum counts/errors of shared keys,
carry the min-count offset for unseen keys, trim to k — preserves the
N_total/k error bound (Agarwal et al., "Mergeable Summaries", PODS 2012).
"""

from __future__ import annotations

import numpy as np


class SpaceSaving:
    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counts: dict[bytes, int] = {}
        self.errors: dict[bytes, int] = {}
        self.n = 0

    def _min_key(self):
        return min(self.counts.items(), key=lambda kv: kv[1])[0]

    def update_batch(self, keys, counts=None) -> None:
        keys = list(keys)
        if counts is None:
            counts = np.ones(len(keys), np.int64)
        # pre-aggregate the batch: one dict op per unique key
        uniq: dict[bytes, int] = {}
        for key, c in zip(keys, counts):
            uniq[key] = uniq.get(key, 0) + int(c)
        for key, c in uniq.items():
            self.n += c
            if key in self.counts:
                self.counts[key] += c
            elif len(self.counts) < self.k:
                self.counts[key] = c
                self.errors[key] = 0
            else:
                victim = self._min_key()
                base = self.counts.pop(victim)
                self.errors.pop(victim)
                self.counts[key] = base + c
                self.errors[key] = base

    def estimate(self, key: bytes):
        """(upper_bound, guaranteed_min) or None if untracked."""
        if key not in self.counts:
            return None
        return self.counts[key], self.counts[key] - self.errors[key]

    def top_k(self, k: int = None):
        k = k or self.k
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(key, cnt, self.errors[key]) for key, cnt in items[:k]]

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.k != other.k:
            raise ValueError("SpaceSaving k mismatch")
        # mergeable-summaries combine: unseen keys inherit the other side's
        # min-count as worst-case offset
        self_min = min(self.counts.values()) if len(self.counts) >= self.k else 0
        other_min = min(other.counts.values()) if len(other.counts) >= other.k else 0
        merged_c: dict[bytes, int] = {}
        merged_e: dict[bytes, int] = {}
        for key in set(self.counts) | set(other.counts):
            if key in self.counts:
                c1, e1 = self.counts[key], self.errors[key]
            else:
                c1, e1 = self_min, self_min
            if key in other.counts:
                c2, e2 = other.counts[key], other.errors[key]
            else:
                c2, e2 = other_min, other_min
            merged_c[key] = c1 + c2
            merged_e[key] = e1 + e2
        top = sorted(merged_c.items(), key=lambda kv: (-kv[1], kv[0]))[: self.k]
        self.counts = dict(top)
        self.errors = {key: merged_e[key] for key, _ in top}
        self.n += other.n
        return self

    # LE layout: u32 k, u64 n, u32 entries, then per entry u32 len, key bytes,
    # u64 count, u64 error
    def to_bytes(self) -> bytes:
        parts = [
            np.array([self.k], "<u4").tobytes(),
            np.array([self.n], "<u8").tobytes(),
            np.array([len(self.counts)], "<u4").tobytes(),
        ]
        for key, c in sorted(self.counts.items()):
            parts.append(np.array([len(key)], "<u4").tobytes())
            parts.append(key)
            parts.append(np.array([c, self.errors[key]], "<u8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SpaceSaving":
        k = int(np.frombuffer(buf[:4], "<u4")[0])
        n = int(np.frombuffer(buf[4:12], "<u8")[0])
        cnt = int(np.frombuffer(buf[12:16], "<u4")[0])
        sk = cls(k)
        sk.n = n
        off = 16
        for _ in range(cnt):
            klen = int(np.frombuffer(buf[off:off + 4], "<u4")[0])
            off += 4
            key = bytes(buf[off:off + klen])
            off += klen
            c, e = np.frombuffer(buf[off:off + 16], "<u8")
            off += 16
            sk.counts[key] = int(c)
            sk.errors[key] = int(e)
        if off != len(buf):
            raise ValueError("bad space-saving buffer")
        return sk
