"""Dense 2-D accumulator matrix (int32 / float32) with Pearson row correlation.

Semantics re-expressed from the reference (library/src/matrix.c:35-305 and
lua_binding/matrix.c:402-700):

- int variant: zero-initialized; ``add`` saturates at INT32_MIN/MAX
  (matrix.c:115-121); out-of-bounds get -> sentinel (we raise instead).
- float variant: NaN means *uninitialized* — init fills NaN (matrix.c:102-108),
  ``add`` to a NaN cell sets (matrix.c:130-134), merge-add skips NaN sources
  (lua_binding/matrix.c:605-609), row sum / pcc treat NaN as missing
  (lua_binding/matrix.c:651-656 and 436-438/462-466).
- pcc(row): Pearson correlation of ``row`` vs every other row using
  *uncorrected* (population) sd over all cols; NaN cells count as 0 in the
  row stats and are skipped in the dot product;
  pcc = (dot - cols*mu1*mu2) / (cols*sd1*sd2); rows with sd == 0 -> -inf
  (excluded); returns (best coefficient, row index) for match max|min, or
  None if nothing finite (lua_binding/matrix.c:402-558).
- merge(op add|set): cell-wise over min(rows) x min(cols)
  (lua_binding/matrix.c:561-621).

In the distributed engine this is the per-group accumulator for
interval x bucket drift matrices (heka_message_monitor.lua:328-358): each
partition builds a partial matrix, merge is cell-wise add — a commutative
monoid for the int variant and for float when partials touch disjoint cells.
"""

from __future__ import annotations

import numpy as np

from .running_stats import RunningStats

_I32 = np.iinfo(np.int32)


class Matrix:
    def __init__(self, rows: int, cols: int, dtype: str = "int"):
        if rows < 1 or cols < 1:
            raise ValueError("bad shape")
        if dtype not in ("int", "float"):
            raise ValueError(dtype)
        self.dtype = dtype
        if dtype == "int":
            self.v = np.zeros((rows, cols), np.int32)
        else:
            self.v = np.full((rows, cols), np.nan, np.float32)

    @property
    def rows(self) -> int:
        return self.v.shape[0]

    @property
    def cols(self) -> int:
        return self.v.shape[1]

    # -- cell ops -------------------------------------------------------------

    def add(self, row: int, col: int, value) -> float:
        if self.dtype == "int":
            nv = int(self.v[row, col]) + int(value)
            nv = min(max(nv, _I32.min), _I32.max)
            self.v[row, col] = nv
            return nv
        cur = self.v[row, col]
        nv = value if np.isnan(cur) else float(cur) + value  # matrix.c:130-134
        self.v[row, col] = np.float32(nv)
        return float(self.v[row, col])

    def set(self, row: int, col: int, value) -> None:
        self.v[row, col] = value

    def get(self, row: int, col: int):
        return self.v[row, col]

    def get_row(self, row: int) -> np.ndarray:
        return self.v[row].copy()

    def clear_row(self, row: int) -> None:
        self.v[row] = 0 if self.dtype == "int" else np.nan

    # -- aggregation ops --------------------------------------------------------

    def sum(self, row: int) -> float:
        r = self.v[row].astype(np.float64)
        return float(np.nansum(r)) if self.dtype == "float" else float(r.sum())

    def _row_stats(self, row: int) -> RunningStats:
        """Row stats with the reference's NaN -> 0 convention
        (lua_binding/matrix.c:462-466)."""
        r = self.v[row].astype(np.float64)
        if self.dtype == "float":
            r = np.where(np.isnan(r), 0.0, r)
        rs = RunningStats()
        rs.update_batch(r)
        return rs

    def _pcc_pair(self, r: int, r1: int, rs1: RunningStats, rs2: RunningStats) -> float:
        sd1, sd2 = rs1.usd(), rs2.usd()
        if sd1 == 0 or sd2 == 0:
            return -np.inf
        a = self.v[r].astype(np.float64)
        b = self.v[r1].astype(np.float64)
        prod = a * b
        if self.dtype == "float":
            prod = np.where(np.isnan(prod), 0.0, prod)  # matrix.c:436-438
        d = float(prod.sum())
        return (d - self.cols * rs1.mean * rs2.mean) / (self.cols * sd1 * sd2)

    def pcc(self, row: int, match: str = "max"):
        """Best/worst Pearson correlation of `row` vs all other rows.
        Returns (coefficient, other_row) or None (lua_binding/matrix.c:470-513).

        Byte-faithful reference quirk: sd==0 rows return the -inf sentinel
        (matrix.c:409/429), which the 'max' scan skips but the 'min' scan
        SELECTS — so pcc(row, 'min') returns None whenever any other row is
        constant, even if finite correlations exist (the C's !isfinite(d)
        check at matrix.c:508 behaves identically)."""
        rs = self._row_stats(row)
        best, idx = (-np.inf, -1) if match == "max" else (np.inf, -1)
        for i in range(self.rows):
            if i == row:
                continue
            tmp = self._pcc_pair(row, i, rs, self._row_stats(i))
            if (match == "max" and tmp > best) or (match == "min" and tmp < best):
                best, idx = tmp, i
        if not np.isfinite(best):
            return None
        return best, idx

    # -- merge ------------------------------------------------------------------

    def merge(self, other: "Matrix", op: str = "add") -> "Matrix":
        if self.dtype != other.dtype:
            raise ValueError("matrix dtype mismatch")
        r = min(self.rows, other.rows)
        c = min(self.cols, other.cols)
        src = other.v[:r, :c]
        if op == "set":
            self.v[:r, :c] = src
        elif self.dtype == "int":
            s = self.v[:r, :c].astype(np.int64) + src.astype(np.int64)
            np.clip(s, _I32.min, _I32.max, out=s)
            self.v[:r, :c] = s.astype(np.int32)
        else:
            dst = self.v[:r, :c]
            src_ok = ~np.isnan(src)  # merge-add skips NaN sources
            dst_nan = np.isnan(dst)
            out = dst.copy()
            out[src_ok & dst_nan] = src[src_ok & dst_nan]
            both = src_ok & ~dst_nan
            out[both] = dst[both] + src[both]
            self.v[:r, :c] = out
        return self

    # -- serialization: LE i32 rows, i32 cols, cells — byte-identical to the
    # reference layout (matrix.c:185-235); the cell dtype is a restore-time
    # parameter, exactly like the reference's separate int/flt entry points

    def to_bytes(self) -> bytes:
        dt = "<i4" if self.dtype == "int" else "<f4"
        return (
            np.array([self.rows, self.cols], "<i4").tobytes()
            + self.v.astype(dt).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes, dtype: str = "int") -> "Matrix":
        rows, cols = np.frombuffer(buf[:8], "<i4")
        m = cls(int(rows), int(cols), dtype)
        dt = "<i4" if dtype == "int" else "<f4"
        cells = np.frombuffer(buf[8:], dt)
        if cells.size != rows * cols:
            raise ValueError("bad matrix buffer")
        m.v = cells.reshape(int(rows), int(cols)).astype(m.v.dtype)
        return m
