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
        if self.tags.size and not self.keys:
            # symmetric counterpart of the update_tags guard: a tag-only
            # sketch has tags with no aligned keys, so a key-carrying
            # update would silently mis-pair tags and keys in _merge_arrays
            raise ValueError("update_batch on a tag-only sketch")
        h = xxh64_batch(keys)
        # batch-local dedup + bottom-k before the merge
        order = np.argsort(h, kind="stable")
        h_sorted = h[order]
        uniq_mask = np.ones(h_sorted.size, bool)
        uniq_mask[1:] = h_sorted[1:] != h_sorted[:-1]
        sel = order[uniq_mask][: self.k]
        sel_sorted = sel[np.argsort(h[sel], kind="stable")]
        self._merge_arrays(h[sel_sorted], [keys[i] for i in sel_sorted])

    def update_tags(self, tags: np.ndarray) -> None:
        """Tag-only update from PRECOMPUTED 64-bit hashes (e.g. Spark's
        codegen'd xxhash64): the hot path when only distinct estimates /
        theta set algebra are needed — 8-byte hashes cross the Arrow
        boundary instead of key strings, and the bottom-k select is pure
        numpy.  Mixing with key-carrying update_batch on the SAME sketch is
        unsupported (tags would come from different hash functions); the
        keys list stays empty, so sample() returns [] in this mode."""
        tags = np.asarray(tags, np.uint64)
        if not tags.size:
            return
        if self.keys:
            raise ValueError("update_tags on a key-carrying sketch")
        sel = np.unique(tags)[: self.k]  # sorted + dedup in one shot
        if self.tags.size == 0:
            self.tags = sel.copy()
            return
        merged = np.union1d(self.tags, sel)
        self.tags = merged[: self.k]

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
        if not self.keys and not other.keys and (self.tags.size or other.tags.size):
            # tag-only mode: pure numpy union + bottom-k
            self.tags = np.union1d(self.tags, other.tags)[: self.k]
            return self
        if (bool(self.keys) != bool(other.keys)
                and self.tags.size and other.tags.size):
            raise ValueError("cannot merge tag-only with key-carrying sketch")
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

    # LE layout: u32 k, u32 n, u64 tags[n], then per key u32 len + bytes —
    # the key section is OMITTED for tag-only sketches (update_tags mode);
    # key-carrying buffers always have n keys, so the formats disambiguate
    # by remaining length.
    def to_bytes(self) -> bytes:
        parts = [np.array([self.k, self.tags.size], "<u4").tobytes(),
                 self.tags.astype("<u8").tobytes()]
        for key in self.keys:
            parts.append(np.array([len(key)], "<u4").tobytes())
            parts.append(key)
        return b"".join(parts)

    def theta_int(self):
        """Theta-sketch threshold in EXACT integer tag space: the k-th
        smallest tag (None while under capacity — the sketch is then an
        EXACT distinct set).  Integer, so threshold comparisons never hit
        float53 rounding against 64-bit tags."""
        if self.tags.size < self.k:
            return None
        return int(self.tags[-1])

    def theta(self) -> float:
        """theta_int as a fraction of the hash space (1.0 under capacity)."""
        ti = self.theta_int()
        return 1.0 if ti is None else ti / _U64_MAX

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BottomKSample":
        k, n = np.frombuffer(buf[:8], "<u4")
        sk = cls(int(k))
        sk.tags = np.frombuffer(buf[8 : 8 + 8 * int(n)], "<u8").copy()
        off = 8 + 8 * int(n)
        if off == len(buf):
            sk.keys = []  # tag-only buffer
            return sk
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


def theta_set_estimates(a: BottomKSample, b: BottomKSample) -> dict:
    """Theta-sketch set algebra (Dasgupta et al., the DataSketches Theta
    construction) over two bottom-k/KMV sketches: cut BOTH samples to the
    common threshold θ = min(θ_A, θ_B); every retained tag is then a
    uniform θ-rate sample of its set, so |S| ≈ count/θ composes through
    ARBITRARY set expressions — including DIFFERENCE, which HLL register
    algebra fundamentally cannot express (inclusion-exclusion gives A∩B but
    never a one-sided A\\B with usable error).  Exact (θ=1) while both
    sketches are under capacity.

    Membership logic: a tag t < θ ≤ θ_B present in A's sample is in B's set
    iff t appears in B's sample (B keeps ALL tags below its own θ_B), so
    set ops on the tag arrays are decisive — no false positives beyond
    64-bit hash collisions.  Returns est_union / est_intersection /
    est_a_minus_b / est_b_minus_a / theta; relative error ~1/sqrt(k) on the
    union scale."""
    cuts = [t for t in (a.theta_int(), b.theta_int()) if t is not None]
    if not cuts:
        th, ta, tb = 1.0, a.tags, b.tags  # both exact
    else:
        cut = np.uint64(min(cuts))  # exact integer threshold, no float loss
        th = int(cut) / _U64_MAX
        ta = a.tags[a.tags < cut]
        tb = b.tags[b.tags < cut]
    inter = np.intersect1d(ta, tb, assume_unique=True)
    scale = 1.0 / th
    return {
        "est_union": (ta.size + tb.size - inter.size) * scale,
        "est_intersection": inter.size * scale,
        "est_a_minus_b": (ta.size - inter.size) * scale,
        "est_b_minus_a": (tb.size - inter.size) * scale,
        "theta": th,
    }
