"""Pure-numpy XXH32 / XXH64 (public xxHash spec), scalar and batch-vectorized.

The reference hashes CMS keys with ``XXH32(item, len, seed)`` at seeds 1 and 2
(reference: library/src/cm_sketch.c:73-74).  xxHash is a public, permissively
licensed algorithm (https://github.com/Cyan4973/xxHash — spec in
doc/xxhash_spec.md); this file implements the spec from scratch in numpy so
the hot path is vectorized (no per-row Python): keys are grouped by byte
length and each same-length group is hashed as a (n, L) uint8 matrix in a
handful of numpy ops.

Nothing here depends on Spark; the Spark layer feeds Arrow batches in.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_U64 = np.uint64

_P32_1 = _U32(2654435761)
_P32_2 = _U32(2246822519)
_P32_3 = _U32(3266489917)
_P32_4 = _U32(668265263)
_P32_5 = _U32(374761393)

_P64_1 = _U64(11400714785074694791)
_P64_2 = _U64(14029467366897019727)
_P64_3 = _U64(1609587929392839161)
_P64_4 = _U64(9650029242287828579)
_P64_5 = _U64(2870177450012600261)

# numpy intentionally wraps on unsigned overflow; silence the warnings locally.
_err = np.errstate(over="ignore")


def _rotl32(x, r):
    r = _U32(r)
    return (x << r) | (x >> _U32(32) - r)


def _rotl64(x, r):
    r = _U64(r)
    return (x << r) | (x >> _U64(64) - r)


def _read_u32(mat: np.ndarray, off: int) -> np.ndarray:
    b = mat[:, off : off + 4].astype(_U32)
    return b[:, 0] | (b[:, 1] << _U32(8)) | (b[:, 2] << _U32(16)) | (b[:, 3] << _U32(24))


def _read_u64(mat: np.ndarray, off: int) -> np.ndarray:
    lo = _read_u32(mat, off).astype(_U64)
    hi = _read_u32(mat, off + 4).astype(_U64)
    return lo | (hi << _U64(32))


def xxh32_matrix(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH32 of every row of a (n, L) uint8 matrix. Returns (n,) uint32."""
    with _err:
        n, length = mat.shape
        seed = _U32(seed)
        if length >= 16:
            v1 = np.full(n, seed + _P32_1 + _P32_2, _U32)
            v2 = np.full(n, seed + _P32_2, _U32)
            v3 = np.full(n, seed, _U32)
            v4 = np.full(n, seed - _P32_1, _U32)
            for s in range(length // 16):
                base = s * 16
                v1 = _rotl32(v1 + _read_u32(mat, base) * _P32_2, 13) * _P32_1
                v2 = _rotl32(v2 + _read_u32(mat, base + 4) * _P32_2, 13) * _P32_1
                v3 = _rotl32(v3 + _read_u32(mat, base + 8) * _P32_2, 13) * _P32_1
                v4 = _rotl32(v4 + _read_u32(mat, base + 12) * _P32_2, 13) * _P32_1
            h = _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
            p = (length // 16) * 16
        else:
            h = np.full(n, seed + _P32_5, _U32)
            p = 0
        h = h + _U32(length)
        while p + 4 <= length:
            h = _rotl32(h + _read_u32(mat, p) * _P32_3, 17) * _P32_4
            p += 4
        while p < length:
            h = _rotl32(h + mat[:, p].astype(_U32) * _P32_5, 11) * _P32_1
            p += 1
        h ^= h >> _U32(15)
        h *= _P32_2
        h ^= h >> _U32(13)
        h *= _P32_3
        h ^= h >> _U32(16)
        return h


def xxh64_matrix(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of every row of a (n, L) uint8 matrix. Returns (n,) uint64."""
    with _err:
        n, length = mat.shape
        seed = _U64(seed)

        def _round(acc, lane):
            return _rotl64(acc + lane * _P64_2, 31) * _P64_1

        if length >= 32:
            v1 = np.full(n, seed + _P64_1 + _P64_2, _U64)
            v2 = np.full(n, seed + _P64_2, _U64)
            v3 = np.full(n, seed, _U64)
            v4 = np.full(n, seed - _P64_1, _U64)
            for s in range(length // 32):
                base = s * 32
                v1 = _round(v1, _read_u64(mat, base))
                v2 = _round(v2, _read_u64(mat, base + 8))
                v3 = _round(v3, _read_u64(mat, base + 16))
                v4 = _round(v4, _read_u64(mat, base + 24))
            h = _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
            for v in (v1, v2, v3, v4):
                h = (h ^ _round(np.zeros(n, _U64), v)) * _P64_1 + _P64_4
            p = (length // 32) * 32
        else:
            h = np.full(n, seed + _P64_5, _U64)
            p = 0
        h = h + _U64(length)
        while p + 8 <= length:
            k1 = _rotl64(_read_u64(mat, p) * _P64_2, 31) * _P64_1
            h = _rotl64(h ^ k1, 27) * _P64_1 + _P64_4
            p += 8
        if p + 4 <= length:
            h = _rotl64(h ^ (_read_u32(mat, p).astype(_U64) * _P64_1), 23) * _P64_2 + _P64_3
            p += 4
        while p < length:
            h = _rotl64(h ^ (mat[:, p].astype(_U64) * _P64_5), 11) * _P64_1
            p += 1
        h ^= h >> _U64(33)
        h *= _P64_2
        h ^= h >> _U64(29)
        h *= _P64_3
        h ^= h >> _U64(32)
        return h


def _group_hash(keys, seed: int, matrix_fn, out_dtype) -> np.ndarray:
    """Hash a sequence of ``bytes`` keys, vectorized per byte-length group."""
    lengths = np.fromiter((len(k) for k in keys), np.int64, len(keys))
    out = np.zeros(len(keys), out_dtype)
    for length in np.unique(lengths):
        idx = np.nonzero(lengths == length)[0]
        if length == 0:
            mat = np.zeros((len(idx), 0), np.uint8)
        else:
            buf = b"".join(keys[i] for i in idx)
            mat = np.frombuffer(buf, np.uint8).reshape(len(idx), length)
        out[idx] = matrix_fn(mat, seed)
    return out


def xxh32_batch(keys, seed: int = 0) -> np.ndarray:
    """Vectorized XXH32 over a list/array of ``bytes``. Returns (n,) uint32."""
    return _group_hash(keys, seed, xxh32_matrix, _U32)


def xxh64_batch(keys, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over a list/array of ``bytes``. Returns (n,) uint64."""
    return _group_hash(keys, seed, xxh64_matrix, _U64)


def xxh32(data: bytes, seed: int = 0) -> int:
    """Scalar XXH32 (convenience wrapper over the vectorized core)."""
    return int(xxh32_matrix(np.frombuffer(data, np.uint8).reshape(1, -1), seed)[0])


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64."""
    return int(xxh64_matrix(np.frombuffer(data, np.uint8).reshape(1, -1), seed)[0])
