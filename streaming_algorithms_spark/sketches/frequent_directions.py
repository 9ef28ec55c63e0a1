"""Frequent Directions: a mergeable deterministic matrix sketch.

Liberty (KDD 2013) / Ghashami, Liberty, Phillips, Woodruff (SIAM J.
Comput. 2016): maintain an ``ell x d`` row sketch ``B`` of a tall matrix
``A`` (one embedding per row) such that

    0  <=  x' A'A x - x' B'B x  <=  ||A||_F^2 / ell      for all unit x,

i.e. ``||A'A - B'B||_2 <= ||A||_F^2 / ell`` — and since
``max_ij |M_ij| <= ||M||_2``, every entry of the approximated Gram /
covariance matrix is within the same bound.  The sketch is DETERMINISTIC
(no randomness) and MERGEABLE: appending the rows of one sketch into
another and re-shrinking preserves the bound for the concatenated input
(Ghashami et al. §3), which is exactly the Spark shape — one partial per
partition, associative merge, bound holds for any partition order.

Implementation: the classic doubled buffer (2*ell rows).  Inserts fill
the free half; when full, one SVD shrinks back to ell rows:

    B <- diag(sqrt(max(sigma^2 - sigma_ell^2, 0))) @ Vt    (top ell rows)

giving amortized O(d * ell) per row.  Arrow batches insert as whole numpy
blocks — no per-row Python.

Reference provenance: the reference library (trink/streaming_algorithms)
has no matrix sketch; this extends its mergeable-accumulator family
(same to_bytes/from_bytes/merge surface as cm_sketch.c / running_stats.c)
to covariance/Gram summaries of the embedding column, the piece a
training-data pipeline needs for PCA/whitening at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FDSK"


class FrequentDirections:
    """Sketch of A'A for a stream of d-dimensional rows."""

    def __init__(self, ell: int, d: int):
        if ell < 2 or d < 1:
            raise ValueError("need ell >= 2, d >= 1")
        self.ell = int(ell)
        self.d = int(d)
        self.buf = np.zeros((2 * self.ell, self.d), np.float64)
        self.n_buf = 0          # filled rows in buf
        self.n_rows = 0         # total input rows consumed
        self.fro_sq = 0.0       # exact ||A||_F^2 (running, exact)

    # -- update ------------------------------------------------------------

    def _shrink(self) -> None:
        b = self.buf[: self.n_buf]
        if self.d <= 4 * self.ell:
            # symmetric eigendecomposition of the d x d Gram instead of an
            # SVD of the buffer: FD's shrink only needs sigma^2 and V, and
            # eigh is ~15x faster than LAPACK gesdd for these small-d
            # shapes (measured 0.76 ms vs 12.2 ms at 64x64 on this host).
            # Tiny negative eigenvalues from fp round-off clamp to 0 —
            # they are below delta and would be zeroed anyway.
            lam, V = np.linalg.eigh(b.T @ b)
            sig2 = np.maximum(lam[::-1], 0.0)
            vt = V[:, ::-1].T
        else:
            # tall embedding dims (d >> ell): economy SVD of the
            # (2*ell x d) buffer is cheaper than a d x d eigh
            _, sigma, vt = np.linalg.svd(b, full_matrices=False)
            sig2 = sigma ** 2
        delta = sig2[self.ell - 1] if sig2.size > self.ell else 0.0
        keep = min(self.ell, sig2.size)
        scaled = np.sqrt(np.maximum(sig2[:keep] - delta, 0.0))
        self.buf[:keep] = scaled[:, None] * vt[:keep]
        self.buf[keep:] = 0.0
        self.n_buf = keep

    def insert_batch(self, X: np.ndarray) -> None:
        """Insert a block of rows (k x d); vectorized fill + amortized SVD."""
        X = np.asarray(X, np.float64)
        if X.ndim != 2 or X.shape[1] != self.d:
            raise ValueError(f"expected (k, {self.d}) block, got {X.shape}")
        self.n_rows += X.shape[0]
        self.fro_sq += float((X * X).sum())
        i = 0
        while i < X.shape[0]:
            free = self.buf.shape[0] - self.n_buf
            take = min(free, X.shape[0] - i)
            self.buf[self.n_buf:self.n_buf + take] = X[i:i + take]
            self.n_buf += take
            i += take
            if self.n_buf == self.buf.shape[0]:
                self._shrink()

    # -- query -------------------------------------------------------------

    def sketch_rows(self) -> np.ndarray:
        """Current B (<= 2*ell rows, final shrink applied): B'B ~= A'A."""
        if self.n_buf > self.ell:
            self._shrink()
        return self.buf[: self.n_buf].copy()

    def gram(self) -> np.ndarray:
        b = self.sketch_rows()
        return b.T @ b

    def error_bound(self) -> float:
        """Published guarantee: ||A'A - B'B||_2 <= ||A||_F^2 / ell."""
        return self.fro_sq / self.ell

    # -- merge -------------------------------------------------------------

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (other.ell, other.d) != (self.ell, self.d):
            raise ValueError("incompatible sketch shapes")
        rows = other.sketch_rows()
        n_r, f_r = other.n_rows, other.fro_sq
        if rows.size:
            self.insert_batch(rows)
        # insert_batch counted sketch rows as input; restore exact tallies
        self.n_rows += n_r - rows.shape[0]
        self.fro_sq += f_r - float((rows * rows).sum())
        return self

    # -- wire --------------------------------------------------------------

    def to_bytes(self) -> bytes:
        b = self.sketch_rows()
        head = _MAGIC + struct.pack(
            "<IIIqd", self.ell, self.d, b.shape[0], self.n_rows, self.fro_sq
        )
        return head + b.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentDirections":
        if buf[:4] != _MAGIC:
            raise ValueError("not an FD sketch buffer")
        ell, d, k, n_rows, fro_sq = struct.unpack_from("<IIIqd", buf, 4)
        sk = cls(ell, d)
        off = 4 + struct.calcsize("<IIIqd")
        rows = np.frombuffer(buf, "<f8", k * d, off).reshape(k, d)
        sk.buf[:k] = rows
        sk.n_buf = k
        sk.n_rows = n_rows
        sk.fro_sq = fro_sq
        return sk
