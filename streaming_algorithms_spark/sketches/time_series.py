"""Fixed-window time series ring + SCRIMP matrix profile + anomaly detection.

Semantics re-expressed from the reference:

- ring buffer of ``rows`` int32 buckets, ``ns_per_row`` ns each; writes ahead
  of the window advance it and zero-fill skipped buckets; writes older than
  the window and reads outside it are rejected (library/src/time_series.c:34-58);
  initial current_time = ns_per_row * (rows - 1) (time_series.c:84);
  saturating int32 add (time_series.c:94-99).
- matrix profile: SCRIMP (Zhu et al., ICDM 2018 — public algorithm) over the
  n buckets starting at ns; subsequence length m; rolling mean/usd per window
  (time_series.c:181-207); diagonal dot-product recurrence
  d = 2*(m - (z - m*mu_i*mu_j)/(sd_i*sd_j)), final sqrt(|d|)
  (time_series.c:210-264); exclusion zone m/4 — only diagonals
  >= m/4 + 1 are evaluated (time_series.c:157-168); ``percent`` computes a
  prefix of the shuffled diagonals (anytime approximation, time_series.c:291);
  at percent=100 the result is order-independent.
- anomaly post-processing (lua_binding/time_series.c:377-405): feed mp values
  through P² q95/q50 (using the *last add's return*, i.e. the running median
  marker), discord = max(mp); returns
  (ns_of_discord, (discord-e95)/(discord-e50)*100, discord-e50);
  ``anomaly_current`` restricts to the last m windows.
- windowed stats over a bucket range with include_zero=False skipping zero
  cells (lua_binding/time_series.c:198-345).
- merge: replay source buckets by timestamp into dest with op add|set;
  source resolution must be >= dest (lua_binding/time_series.c:120-153).

Distributed mapping: a *series* here is one group (e.g. one host) after
``groupBy(host, window(warc_ts))`` pre-aggregation; the ring semantics are
needed only for the Structured Streaming variant.  The SCRIMP kernel runs
vectorized per group inside ``applyInPandas``.
"""

from __future__ import annotations

import math

import numpy as np

from .p2 import P2Quantile
from .running_stats import RunningStats

_I32 = np.iinfo(np.int32)
SENTINEL = _I32.min  # INT_MIN rejection sentinel


def rolling_mean_usd(values: np.ndarray, m: int):
    """Per-window mean and uncorrected sd for all length-m windows of
    ``values`` (float64).  Matches compute_stats (time_series.c:181-207) to
    floating-point accuracy."""
    v = values.astype(np.float64)
    n = v.size
    w = n - m + 1
    c = np.concatenate([[0.0], np.cumsum(v)])
    c2 = np.concatenate([[0.0], np.cumsum(v * v)])
    s = c[m:] - c[:-m]
    s2 = c2[m:] - c2[:-m]
    mean = s / m
    var = np.maximum(s2 / m - mean * mean, 0.0)
    return mean, np.sqrt(var)


def _mp_corr_diagonal(v, m, mean, sd, diags, stop):
    """Per-diagonal max-correlation sweep (anytime order) — the mp-only fast
    path when percent < 100 requires the shuffled diagonal prefix."""
    n = v.size
    mp_len = n - m + 1
    a = m * mean  # hoisted: (m*mu_j)*mu_i keeps the parity fp order
    prod = np.empty(n)
    zc = np.empty(n + 1)
    zc[0] = 0.0
    cbuf = np.empty(mp_len)
    tbuf = np.empty(mp_len)
    corr = np.full(mp_len, -np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        for ri, diag in enumerate(diags):
            L = mp_len - diag
            nd = n - diag
            np.multiply(v[diag:], v[:nd], out=prod[:nd])
            np.cumsum(prod[:nd], out=zc[1 : nd + 1])
            c = cbuf[:L]
            np.subtract(zc[m : L + m], zc[:L], out=c)  # z via prefix sums
            np.multiply(a[diag:], mean[:L], out=tbuf[:L])
            c -= tbuf[:L]
            np.multiply(sd[diag:], sd[:L], out=tbuf[:L])
            c /= tbuf[:L]
            # both endpoints take the max correlation; fmax skips NaN
            # exactly as the parity path's `d < mp` comparison does
            np.fmax(corr[diag:], c, out=corr[diag:])
            np.fmax(corr[:L], c, out=corr[:L])
            if ri == stop:
                break
    return corr


def matrix_profile(values: np.ndarray, m: int, percent: float = 100.0,
                   seed: int = None, with_index: bool = True):
    """SCRIMP matrix profile of a 1-D int/float series.

    Returns (mp, mpi) of length len(values)-m+1.  percent<100 evaluates only
    a prefix of the shuffled diagonals; pass ``seed`` for a deterministic
    shuffle (the reference uses unseeded rand(), time_series.c:124-132 — we
    expose a seed instead, SURVEY §7).

    ``with_index=False`` skips the per-window nearest-neighbor index (mpi is
    returned as None) and runs a reduced-pass sweep: it tracks the maximum of
    the inner correlation term c = (z - m*mu_i*mu_j)/(sd_i*sd_j) per window
    (min distance ⇔ max c, a strictly monotone map applied once at the end),
    replacing the two boolean-masked fancy-index updates per diagonal with
    two `np.fmax` passes and dropping the per-diagonal affine scaling —
    ~9 memory passes/diagonal instead of ~14 plus fancy indexing.  At
    percent=100 (order-independent) it further dispatches to the
    register-resident C sweep in ``_mp_native`` when a compiler is available
    (0.167 s vs 0.227 s for the reference C and 0.73 s for the parity sweep
    on the 11.5k-pt harness shape).  Every path keeps identical per-element
    arithmetic (z via prefix sums, the m*mu*mu product order, the division),
    so distances agree bit-for-bit; anomaly/discord workloads (which never
    read mpi) use this path — see operators/mp_anomaly.py and
    plans/queries.py."""
    v = np.asarray(values, np.float64)
    n = v.size
    if not (0 < percent <= 100) or m < 4 or n // 4 < m:
        raise ValueError("invalid matrix profile parameters")
    mp_len = n - m + 1
    mean, sd = rolling_mean_usd(v, m)

    exclude = m // 4
    diags = np.arange(exclude + 1, mp_len)
    rng = np.random.default_rng(seed)
    rng.shuffle(diags)
    stop = int(percent / 100 * mp_len + 1)

    if not with_index:
        corr = None
        if percent == 100:  # the native kernel is a full (order-free) sweep
            from ._mp_native import mp_corr_native

            corr = mp_corr_native(v, m, mean, sd, exclude)
        if corr is None:
            corr = _mp_corr_diagonal(v, m, mean, sd, diags, stop)
        mp = 2.0 * (m - corr)
        return np.sqrt(np.abs(mp)), None

    # preallocated work buffers: the diagonal sweep is O(n^2) — fresh
    # allocations per diagonal turn a cache-resident kernel into a memory-
    # bandwidth-bound one (matters at high executor counts)
    prod = np.empty(n)
    zc = np.empty(n + 1)
    zc[0] = 0.0
    dbuf = np.empty(mp_len)

    mp = np.full(mp_len, np.inf)
    mpi = np.zeros(mp_len, np.int64)
    idx = np.arange(mp_len)

    with np.errstate(divide="ignore", invalid="ignore"):
        for ri, diag in enumerate(diags):
            # z_j = dot(v[j:j+m], v[j-diag:j-diag+m]) for j in [diag, mp_len)
            L = mp_len - diag  # number of (i, j=i+diag) pairs
            nd = n - diag
            np.multiply(v[diag:], v[:nd], out=prod[:nd])
            np.cumsum(prod[:nd], out=zc[1 : nd + 1])
            d = dbuf[:L]
            # d = 2*(m - (z - m*mu_j*mu_i)/(sd_j*sd_i)), z via prefix sums
            np.subtract(zc[m : L + m], zc[:L], out=d)
            d -= m * mean[diag:] * mean[:L]
            d /= sd[diag:] * sd[:L]
            np.subtract(m, d, out=d)
            d *= 2.0
            # replay the reference's sequential argmin along the diagonal:
            # both endpoints take the min; ties keep the earlier value
            mj, ij = mp[diag:], mpi[diag:]
            better = d < mj
            mj[better] = d[better]
            ij[better] = idx[:L][better]
            mi, ii = mp[:L], mpi[:L]
            better = d < mi
            mi[better] = d[better]
            ii[better] = idx[diag:][better]
            if ri == stop:
                break
    return np.sqrt(np.abs(mp)), mpi


def anomaly_from_profile(mp: np.ndarray, ns: int, ns_per_row: int,
                         m: int, current_only: bool = False):
    """P²-based discord scoring (lua_binding/time_series.c:377-405).
    Returns (timestamp, range_pct, distance) or None.

    Byte-faithful reference quirks, kept deliberately (and replicated by the
    C at the cited lines): e95/e50 are the LAST add's return, which is NaN
    until P²'s 5-marker init completes (so current_only with m < 5 always
    scores NaN) and is the marker count n[2]=3.0 on exactly the 5th sample
    (p2.c:95); a constant profile (discord == e50) divides 0/0 → NaN like C
    double division, via np.errstate, rather than raising."""
    start = len(mp) - m if current_only else 0
    q95, q50 = P2Quantile(0.95), P2Quantile(0.50)
    discord, idx = -math.inf, 0
    e95 = e50 = math.nan
    for i in range(start, len(mp)):
        e95 = q95.add(float(mp[i]))
        e50 = q50.add(float(mp[i]))
        if mp[i] > discord:
            discord = float(mp[i])
            idx = i
    if math.isinf(discord):
        return None
    with np.errstate(divide="ignore", invalid="ignore"):
        pct = float(np.float64(discord - e95) / np.float64(discord - e50) * 100)
    return ns + idx * ns_per_row, pct, discord - e50


class TimeSeries:
    """int32 ring buffer over wall-clock ns (reference parity variant)."""

    def __init__(self, rows: int, ns_per_row: int):
        if rows < 2 or ns_per_row < 1:
            raise ValueError("rows >= 2, ns_per_row >= 1 required")
        self.rows = rows
        self.ns_per_row = ns_per_row
        self.v = np.zeros(rows, np.int32)
        self.current_time = ns_per_row * (rows - 1)

    def _find_index(self, ns: int, advance: bool) -> int:
        current_row = self.current_time // self.ns_per_row
        requested_row = ns // self.ns_per_row
        delta = requested_row - current_row
        if delta > 0 and advance:
            if delta >= self.rows:
                self.v[:] = 0
            else:
                oidx = current_row % self.rows + 1
                if oidx == self.rows:
                    oidx = 0
                end = oidx + delta
                if end <= self.rows:
                    self.v[oidx:end] = 0
                else:
                    self.v[oidx:] = 0
                    self.v[: end - self.rows] = 0
            self.current_time = ns - (ns % self.ns_per_row)
        elif requested_row > current_row or abs(delta) >= self.rows:
            return -1
        return requested_row % self.rows

    def add(self, ns: int, value: int) -> int:
        idx = self._find_index(ns, True)
        if idx == -1:
            return SENTINEL
        nv = int(self.v[idx]) + value
        nv = min(max(nv, _I32.min), _I32.max)
        self.v[idx] = nv
        return nv

    def set(self, ns: int, value: int) -> int:
        idx = self._find_index(ns, True)
        if idx == -1:
            return SENTINEL
        self.v[idx] = value
        return value

    def get(self, ns: int) -> int:
        idx = self._find_index(ns, False)
        return SENTINEL if idx == -1 else int(self.v[idx])

    def window_start_ns(self) -> int:
        return self.current_time - self.ns_per_row * (self.rows - 1)

    def get_range(self, ns: int = None, n: int = None) -> np.ndarray:
        """n consecutive buckets from ns (default: whole window)."""
        if ns is None:
            ns = self.window_start_ns()
        if n is None:
            n = self.rows
        start_row = ns // self.ns_per_row
        out = np.empty(n, np.int64)
        for k in range(n):
            out[k] = self.get((start_row + k) * self.ns_per_row)
        return out

    def stats(self, ns: int = None, n: int = None, include_zero: bool = False):
        """sum/min/max/avg/sd/usd over a bucket range; include_zero=False
        treats 0 as uninitialized and skips it (lua_binding/time_series.c:198-345)."""
        vals = self.get_range(ns, n)
        vals = vals[vals != SENTINEL]
        if not include_zero:
            vals = vals[vals != 0]
        rs = RunningStats()
        rs.update_batch(vals.astype(np.float64))
        if rs.count == 0:
            return None
        return {
            "count": int(rs.count),
            "sum": float(vals.sum()),
            "min": int(vals.min()),
            "max": int(vals.max()),
            "avg": rs.mean,
            "sd": rs.sd(),
            "usd": rs.usd(),
        }

    def merge(self, other: "TimeSeries", op: str = "add") -> "TimeSeries":
        """Replay other's buckets by timestamp (lua_binding/time_series.c:120-153)."""
        if other.ns_per_row > self.ns_per_row:
            raise ValueError("source resolution must be >= dest")
        start = other.window_start_ns()
        for k in range(other.rows):
            ns = start + k * other.ns_per_row
            val = other.get(ns)
            if val == SENTINEL:
                continue
            if op == "add":
                self.add(ns, val)
            else:
                self.set(ns, val)
        return self

    def matrix_profile(self, ns: int = None, n: int = None, m: int = 4,
                       percent: float = 100.0, seed: int = None):
        if ns is None:
            ns = self.window_start_ns()
        else:
            ns = ns - (ns % self.ns_per_row)
        if n is None:
            n = self.rows
        if n > self.rows:
            raise ValueError("n > rows")
        vals = self.get_range(ns, n)
        if np.any(vals == SENTINEL):
            raise ValueError("range outside window")
        return matrix_profile(vals, m, percent, seed)

    def anomaly(self, ns: int = None, n: int = None, m: int = 4,
                percent: float = 100.0, current_only: bool = False,
                seed: int = None):
        if ns is None:
            ns_eff = self.window_start_ns()
        else:
            ns_eff = ns - (ns % self.ns_per_row)
        mp, _ = self.matrix_profile(ns_eff, n, m, percent, seed)
        return anomaly_from_profile(mp, ns_eff, self.ns_per_row, m, current_only)

    # LE layout mirrors time_series.c:314-339: u64 current_time, u64 ns_per_row,
    # i32 rows, i32 v[rows], + 4 trailing pad bytes (the C buffer is sized by
    # sizeof(struct) which includes 4 bytes of alignment padding the reference
    # never initializes; we zero them, and accept buffers with or without them)
    def to_bytes(self) -> bytes:
        return (
            np.array([self.current_time, self.ns_per_row], "<u8").tobytes()
            + np.array([self.rows], "<i4").tobytes()
            + self.v.astype("<i4").tobytes()
            + b"\x00" * 4
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TimeSeries":
        ct, npr = np.frombuffer(buf[:16], "<u8")
        rows = int(np.frombuffer(buf[16:20], "<i4")[0])
        if len(buf) not in (20 + 4 * rows, 24 + 4 * rows):
            raise ValueError("bad time series buffer")
        ts = cls(rows, int(npr))
        ts.current_time = int(ct)
        ts.v = np.frombuffer(buf[20 : 20 + 4 * rows], "<i4").copy()
        return ts
