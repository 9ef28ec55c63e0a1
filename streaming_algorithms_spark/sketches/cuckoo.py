"""Cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher, CoNLL 2014) —
set-membership with deletion support; the "cuckoo" half of the north star's
"cuckoo/Bloom membership filters".

Standard construction: buckets of 4 x 16-bit fingerprints; item -> fingerprint
f = fp(h), bucket i1 = h mod m, alternate i2 = i1 XOR (hash(f) mod m)
(partial-key cuckoo hashing — the XOR trick makes the alternate computable
from (bucket, fingerprint) alone, which is what permits eviction chains).

NOT a commutative monoid: unlike Bloom, two cuckoo filters cannot be merged
bit-wise (insert-order and eviction state matter), so the distributed pattern
is build-on-dimension -> broadcast -> probe, same as bloom_might_contain.
Deletions must only remove previously-inserted items (standard caveat).

A small stash (Kirsch-Mitzenmacher-Wieder) catches the victim fingerprint
when an eviction chain exhausts its kicks: the no-false-negatives contract
survives an over-capacity condition — the victim lands in the stash (and is
checked by contains/delete) instead of being silently dropped.

Early-fail trade-off (deliberate, conservative): once the stash is FULL,
any insert that would need an eviction chain fails immediately — even
though some chains would have found an empty slot without producing a
final victim.  Attempting the chain first would require undoing mutated
slots on failure (kicks move fingerprints as they go); failing before any
mutation keeps inserts atomic at the cost of declaring "over capacity"
slightly before true capacity.  At the standard 95% load factor the
filter is deep into degraded territory by the time 32 stash slots are
occupied, so the early refusal costs a negligible sliver of capacity.
"""

from __future__ import annotations

import numpy as np

from .xxhash import xxh64, xxh64_batch

_SLOTS = 4
_MAX_KICKS = 500
_MAX_STASH = 32


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        m = 1
        while m * _SLOTS * 0.95 < capacity:
            m *= 2
        self.m = m
        self.seed = seed
        self.table = np.zeros((m, _SLOTS), np.uint16)  # 0 = empty
        self.n_items = 0
        self.stash: list[tuple[int, int]] = []  # (bucket idx, fingerprint)
        self._rng = np.random.default_rng(seed)

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        f = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)  # reserve 0 for empty

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.m - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, f: np.ndarray) -> np.ndarray:
        # i XOR hash(f), constrained to table size (power of two)
        with np.errstate(over="ignore"):
            fh = f.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)
        return (i.astype(np.uint64) ^ fh) .astype(np.uint64) % np.uint64(self.m)

    def _insert_one(self, i: int, f: int) -> bool:
        for idx in (i, int(self._alt(np.array([i]), np.array([f], np.uint16))[0])):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return True
        # evict — but only if the stash can still catch the chain's final
        # victim: once kicks start, table state mutates and the victim MUST
        # land somewhere, so a full stash fails the insert HERE, before any
        # mutation (no silent loss, no over-cap stash, failed insert not
        # counted as resident).
        if len(self.stash) >= _MAX_STASH:
            return False
        idx = i
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, _SLOTS))
            f, self.table[idx, slot] = int(self.table[idx, slot]), f
            idx = int(self._alt(np.array([idx]), np.array([f], np.uint16))[0])
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return True
        # kicks exhausted: stash the victim (slot reserved above)
        self.stash.append((idx, f))
        return True

    def update_batch(self, keys) -> None:
        keys = list(keys)
        if not keys:
            return
        h = xxh64_batch(keys, self.seed)
        fs = self._fingerprint(h)
        i1s = self._i1(h)
        for i, f in zip(i1s, fs):
            if not self._insert_one(int(i), int(f)):
                # failed insert mutated nothing and is NOT counted resident
                raise RuntimeError("cuckoo filter over capacity (stash full)")
            self.n_items += 1  # stashed victims are still resident

    def contains_batch(self, keys) -> np.ndarray:
        keys = list(keys)
        if not keys:
            return np.zeros(0, bool)
        h = xxh64_batch(keys, self.seed)
        f = self._fingerprint(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, f).astype(np.int64)
        in1 = (self.table[i1] == f[:, None]).any(axis=1)
        in2 = (self.table[i2] == f[:, None]).any(axis=1)
        found = in1 | in2
        for sidx, sf in self.stash:
            # a stashed (bucket, fingerprint) matches keys whose bucket pair
            # contains that bucket (the pair is closed under _alt)
            found |= (f == sf) & ((i1 == sidx) | (i2 == sidx))
        return found

    def contains(self, key: bytes) -> bool:
        return bool(self.contains_batch([key])[0])

    def delete(self, key: bytes) -> bool:
        h = np.array([xxh64(key, self.seed)], np.uint64)
        f = int(self._fingerprint(h)[0])
        i1 = int(self._i1(h)[0])
        i2 = int(self._alt(np.array([i1]), np.array([f], np.uint16))[0])
        for idx in (i1, i2):
            slots = np.nonzero(self.table[idx] == f)[0]
            if slots.size:
                self.table[idx, slots[0]] = 0
                self.n_items -= 1
                return True
        for k, (sidx, sf) in enumerate(self.stash):
            if sf == f and sidx in (i1, i2):
                del self.stash[k]
                self.n_items -= 1
                return True
        return False

    # LE layout: u64 m, u64 n_items, u32 seed, u16 table cells,
    # then u16 stash_len + stash entries (u64 idx, u16 f)
    def to_bytes(self) -> bytes:
        stash = b"".join(
            np.array([i], "<u8").tobytes() + np.array([f], "<u2").tobytes()
            for i, f in self.stash
        )
        return (
            np.array([self.m, self.n_items], "<u8").tobytes()
            + np.array([self.seed], "<u4").tobytes()
            + self.table.astype("<u2").tobytes()
            + np.array([len(self.stash)], "<u2").tobytes()
            + stash
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CuckooFilter":
        m, n = np.frombuffer(buf[:16], "<u8")
        seed = int(np.frombuffer(buf[16:20], "<u4")[0])
        sk = cls.__new__(cls)
        sk.m = int(m)
        sk.seed = seed
        sk.n_items = int(n)
        sk._rng = np.random.default_rng(seed)
        tbytes = sk.m * _SLOTS * 2
        cells = np.frombuffer(buf[20:20 + tbytes], "<u2")
        if cells.size != sk.m * _SLOTS:
            raise ValueError("bad cuckoo buffer")
        sk.table = cells.reshape(sk.m, _SLOTS).copy()
        sk.stash = []
        off = 20 + tbytes
        if len(buf) == off:
            return sk  # pre-stash wire format (v1 buffers): empty stash
        if len(buf) < off + 2:
            raise ValueError("bad cuckoo buffer (truncated stash header)")
        n_stash = int(np.frombuffer(buf[off:off + 2], "<u2")[0])
        off += 2
        if len(buf) < off + 10 * n_stash:
            raise ValueError("bad cuckoo buffer (truncated stash)")
        for _ in range(n_stash):
            i = int(np.frombuffer(buf[off:off + 8], "<u8")[0])
            f = int(np.frombuffer(buf[off + 8:off + 10], "<u2")[0])
            sk.stash.append((i, f))
            off += 10
        return sk
