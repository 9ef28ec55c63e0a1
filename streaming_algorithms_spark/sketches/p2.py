"""P² streaming quantile & equiprobable histogram (Jain & Chlamtac 1985).

Reference-parity kernel (library/src/p2.c:43-349).  P² keeps 5 markers
(quantile) or b+1 markers (histogram) and moves them by parabolic/linear
interpolation; it stores no observations.

P² markers are NOT mergeable — this kernel exists for reference parity on a
single ordered stream (e.g. inside one ``applyInPandas`` group ordered by a
sequence column).  Distributed quantiles use :mod:`kll` instead (SURVEY §2.2).
"""

from __future__ import annotations

import math

import numpy as np


def _parabolic(i: int, d: float, q, n) -> float:
    # p2.c:25-34
    return q[i] + d / (n[i + 1] - n[i - 1]) * (
        (n[i] - n[i - 1] + d) * (q[i + 1] - q[i]) / (n[i + 1] - n[i])
        + (n[i + 1] - n[i] - d) * (q[i] - q[i - 1]) / (n[i] - n[i - 1])
    )


def _linear(i: int, d: float, q, n) -> float:
    # p2.c:37-40
    di = int(d)
    return q[i] + d * (q[i + di] - q[i]) / (n[i + di] - n[i])


class P2Quantile:
    """5-marker P² estimator for quantile p (p2.c:43-161)."""

    MARKERS = 5

    def __init__(self, p: float):
        if not (0.0 <= p <= 1.0):
            raise ValueError("p must be in [0,1]")
        # the reference stores p as float32 (p2_impl.h) — keep that precision
        self.p = float(np.float32(p))
        self.cnt = self.MARKERS  # markers still unfilled
        self.q = [0.0] * 5
        self.n = [1.0, 2.0, 3.0, 4.0, 5.0]
        self.n1 = [1.0, 1 + 2 * self.p, 1 + 4 * self.p, 3 + 2 * self.p, 5.0]

    def add(self, x: float) -> float:
        if self.cnt:
            self.cnt -= 1
            self.q[self.cnt] = x
            if self.cnt == 0:
                self.q.sort()
                return self.n[2]
            return math.nan
        q, n = self.q, self.n
        if x < q[0]:
            q[0] = x
            k = 1
        elif q[0] <= x < q[1]:
            k = 1
        elif q[1] <= x < q[2]:
            k = 2
        elif q[2] <= x < q[3]:
            k = 3
        elif q[3] <= x <= q[4]:
            k = 4
        else:  # q[4] < x
            q[4] = x
            k = 4
        for i in range(k, 5):
            n[i] += 1
        self.n1[1] += self.p / 2
        self.n1[2] += self.p
        self.n1[3] += (1 + self.p) / 2
        self.n1[4] += 1
        for i in range(1, 4):
            d = self.n1[i] - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) or (d <= -1 and n[i - 1] - n[i] < -1):
                d = 1.0 if d > 0 else -1.0
                q1 = _parabolic(i, d, q, n)
                if q[i - 1] < q1 < q[i + 1]:
                    q[i] = q1
                else:
                    q[i] = _linear(i, d, q, n)
                n[i] += d
        return q[2]

    def update_batch(self, xs) -> None:
        for x in np.asarray(xs, np.float64):
            self.add(float(x))

    def estimate(self, marker: int = 2) -> float:
        if marker >= 5 or self.cnt != 0:
            return math.nan
        return self.q[marker]

    def count(self, marker: int) -> int:
        if marker >= 5 or self.cnt != 0:
            return 0
        return int(self.n[marker])

    # serialization mirrors p2.c:172-202: u16 cnt, f32 p, f64 q[5] n[5] n1[5], LE
    def to_bytes(self) -> bytes:
        return (
            np.array([self.cnt], "<u2").tobytes()
            + np.array([self.p], "<f4").tobytes()
            + np.array(self.q + self.n + self.n1, "<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "P2Quantile":
        if len(buf) != 2 + 4 + 15 * 8:
            raise ValueError("bad p2 buffer")  # rc 1
        cnt = int(np.frombuffer(buf[:2], "<u2")[0])
        if cnt > cls.MARKERS:
            raise ValueError("bad marker count")  # rc 2
        p = float(np.frombuffer(buf[2:6], "<f4")[0])
        vals = np.frombuffer(buf[6:], "<f8")
        sk = cls(p)
        sk.cnt = cnt
        sk.q = list(vals[0:5])
        sk.n = list(vals[5:10])
        sk.n1 = list(vals[10:15])
        return sk


class P2Histogram:
    """(b+1)-marker equiprobable histogram (p2.c:247-349)."""

    def __init__(self, buckets: int):
        if not (4 <= buckets <= 65534):
            raise ValueError("buckets must be in [4, 65534]")
        self.b = buckets
        self.cnt = buckets + 1
        self.q = [0.0] * (buckets + 1)
        self.n = [float(i + 1) for i in range(buckets + 1)]

    def add(self, x: float) -> None:
        if self.cnt:
            self.cnt -= 1
            self.q[self.cnt] = x
            if self.cnt == 0:
                self.q.sort()
            return
        q, n, b = self.q, self.n, self.b
        k = 0
        if x < q[0]:
            q[0] = x
            k = 1
        else:
            for i in range(b - 1):
                if q[i] <= x < q[i + 1]:
                    k = i + 1
                    break
        if k == 0:
            if q[b - 1] <= x <= q[b]:
                k = b
            elif q[b] < x:
                q[b] = x
                k = b
        for i in range(k, b + 1):
            n[i] += 1
        for i in range(1, b):
            n1 = 1 + i * (n[b] - 1) / b
            d = n1 - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) or (d <= -1 and n[i - 1] - n[i] < -1):
                d = 1.0 if d > 0 else -1.0
                q1 = _parabolic(i, d, q, n)
                if q[i - 1] < q1 < q[i + 1]:
                    q[i] = q1
                else:
                    q[i] = _linear(i, d, q, n)
                n[i] += d

    def update_batch(self, xs) -> None:
        for x in np.asarray(xs, np.float64):
            self.add(float(x))

    def estimate(self, marker: int) -> float:
        if marker > self.b or self.cnt != 0:
            return math.nan
        return self.q[marker]

    def count(self, marker: int) -> int:
        if marker > self.b or self.cnt != 0:
            return 0
        return int(self.n[marker])

    # layout mirrors p2.c:364-383 byte-for-byte: u16 cnt, f64 q[b+1] n[b+1],
    # LE; the bucket count is a restore-time parameter (deserialize validates
    # the length against it — p2.c:391 rc 1)
    def to_bytes(self) -> bytes:
        return (
            np.array([self.cnt], "<u2").tobytes()
            + np.array(self.q + self.n, "<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes, buckets: int = None) -> "P2Histogram":
        if buckets is None:
            # infer from length: 2 + 16*(b+1)
            if (len(buf) - 2) % 16:
                raise ValueError("bad p2 histogram buffer")
            buckets = (len(buf) - 2) // 16 - 1
        if len(buf) != 2 + 2 * (buckets + 1) * 8:
            raise ValueError("bad p2 histogram buffer")  # rc 1
        cnt = int(np.frombuffer(buf[:2], "<u2")[0])
        if cnt > buckets + 1:
            raise ValueError("bad marker count")  # rc 2
        vals = np.frombuffer(buf[2:], "<f8")
        sk = cls(buckets)
        sk.cnt = cnt
        sk.q = list(vals[: buckets + 1])
        sk.n = list(vals[buckets + 1 :])
        return sk
