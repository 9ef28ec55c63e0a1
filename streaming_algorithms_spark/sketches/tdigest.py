"""t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests") — mergeable quantile sketch, the second distributed-quantile
option next to KLL (north_rule lists both).

Merging-digest variant: centroids kept fully merged under the scale function
k1 (arcsin); an incoming batch is sorted, concatenated with the existing
centroids, and re-merged left-to-right subject to the k-size bound.  This is
deterministic (no RNG), so equal multisets of inputs in ANY partition split
produce byte-identical digests when merged through ``merge`` — stronger than
KLL's probabilistic guarantee... with the usual t-digest caveat that the
*intermediate* centroid layout depends on merge order; the rank-error bound
(<= ~1/delta near the median, tighter at the tails) is what the tests assert.
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    def __init__(self, delta: float = 200.0):
        if delta < 20:
            raise ValueError("delta too small")
        self.delta = float(delta)
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self.n = 0.0
        self._buf_means: list = []
        self._buf_weights: list = []

    # scale function k1 and its inverse bound
    def _k(self, q: float) -> float:
        return self.delta / (2 * math.pi) * math.asin(2 * q - 1)

    def update_batch(self, xs) -> None:
        xs = np.asarray(xs, np.float64)
        xs = xs[np.isfinite(xs)]
        if xs.size == 0:
            return
        self._buf_means.append(xs)
        self._buf_weights.append(np.ones(xs.size))
        if sum(a.size for a in self._buf_means) > 10 * self.delta:
            self._flush()

    def update(self, x: float) -> None:
        self.update_batch([x])

    def _flush(self) -> None:
        if not self._buf_means:
            return
        means = np.concatenate([self.means] + self._buf_means)
        weights = np.concatenate([self.weights] + self._buf_weights)
        self._buf_means, self._buf_weights = [], []
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        self.n = total
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        k_lo = self._k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (w_so_far + cur_w + w) / total
            if self._k(min(q_hi, 1.0)) - k_lo <= 1.0:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_lo = self._k(w_so_far / total)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("t-digest delta mismatch")
        other._flush()
        if other.means.size:
            self._buf_means.append(other.means)
            self._buf_weights.append(other.weights)
        self._flush()
        return self

    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        cw = np.cumsum(self.weights) - self.weights / 2
        target = q * self.n
        return float(np.interp(target, cw, self.means))

    def rank(self, x: float) -> float:
        self._flush()
        if self.means.size == 0:
            return math.nan
        cw = np.cumsum(self.weights) - self.weights / 2
        return float(np.interp(x, self.means, cw) / self.n)

    # LE layout: f64 delta, f64 n, u32 n_centroids, f64 means, f64 weights
    def to_bytes(self) -> bytes:
        self._flush()
        return (
            np.array([self.delta, self.n], "<f8").tobytes()
            + np.array([self.means.size], "<u4").tobytes()
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        delta, n = np.frombuffer(buf[:16], "<f8")
        k = int(np.frombuffer(buf[16:20], "<u4")[0])
        if len(buf) != 20 + 16 * k:
            raise ValueError("bad t-digest buffer")
        td = cls(delta)
        td.n = float(n)
        td.means = np.frombuffer(buf[20 : 20 + 8 * k], "<f8").copy()
        td.weights = np.frombuffer(buf[20 + 8 * k :], "<f8").copy()
        return td
