"""Optional native SCRIMP inner loop (mp-only, percent=100).

The numpy diagonal sweep pays ~9 memory passes per diagonal; the C reference
(library/src/time_series.c:210-264) does the same O(n^2) pair work in a
register-resident recurrence, which is ~3x faster on bandwidth-limited
hosts.  This module closes that gap without changing results: a ~30-line C
kernel with the *same floating-point operation order* as the numpy path —
prefix-sum z (sequential adds, exactly np.cumsum), the (m*mu_j)*mu_i product
order, one division, NaN-skipping max — compiled at first use with
`-ffp-contract=off` (no FMA contraction) so distances match the numpy sweep
bit-for-bit (asserted in tests/test_sketches_extended.py).

Build is lazy and cached in a content-hashed tmp dir; anything failing
(no compiler, read-only tmp, exotic platform) falls back to the numpy sweep
— executors never hard-require a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <stdint.h>
#include <math.h>

/* Max-correlation sweep over all diagonals > exclude (full SCRIMP,
   percent=100).  corr[i] = max over pairs (i,j) of
   (z - (m*mu_j)*mu_i) / (sd_j*sd_i); caller maps to distances via
   2*(m - corr).  fp op order matches the numpy sweep exactly. */
void mp_corr(const double *v, int64_t n, int64_t m,
             const double *mean, const double *sd,
             int64_t exclude, double *zc, double *corr)
{
    int64_t mp_len = n - m + 1;
    for (int64_t i = 0; i < mp_len; i++) corr[i] = -INFINITY;
    for (int64_t diag = exclude + 1; diag < mp_len; diag++) {
        int64_t L = mp_len - diag;
        int64_t nd = n - diag;
        double acc = 0.0;
        zc[0] = 0.0;
        for (int64_t i = 0; i < nd; i++) {   /* np.cumsum: sequential adds */
            acc += v[diag + i] * v[i];
            zc[i + 1] = acc;
        }
        for (int64_t i = 0; i < L; i++) {
            double z = zc[i + m] - zc[i];
            double c = (z - (m * mean[diag + i]) * mean[i])
                       / (sd[diag + i] * sd[i]);
            /* np.fmax: NaN comparisons are false -> NaN never overwrites */
            if (c > corr[i]) corr[i] = c;
            if (c > corr[diag + i]) corr[diag + i] = c;
        }
    }
}
"""

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
        d = os.path.join(tempfile.gettempdir(), f"spark_graft_mp_{tag}")
        so = os.path.join(d, "mp_kernel.so")
        if not os.path.exists(so):
            os.makedirs(d, exist_ok=True)
            csrc = os.path.join(d, "mp_kernel.c")
            with open(csrc, "w") as f:
                f.write(_SRC)
            tmp_so = f"{so}.{os.getpid()}"  # concurrent executors: build
            subprocess.run(                 # privately, publish atomically
                ["cc", "-O2", "-std=c99", "-ffp-contract=off",
                 "-shared", "-fPIC", csrc, "-o", tmp_so, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so)
        lib = ctypes.CDLL(so)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.mp_corr.restype = None
        lib.mp_corr.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                dp, dp, ctypes.c_int64, dp, dp]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def mp_corr_native(v: np.ndarray, m: int, mean: np.ndarray, sd: np.ndarray,
                   exclude: int):
    """Native max-correlation sweep; returns None when unavailable (caller
    falls back to the numpy sweep)."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, np.float64)
    mean = np.ascontiguousarray(mean, np.float64)
    sd = np.ascontiguousarray(sd, np.float64)
    n = v.size
    mp_len = n - m + 1
    zc = np.empty(n + 1)
    corr = np.empty(mp_len)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.mp_corr(v.ctypes.data_as(dp), n, m,
                mean.ctypes.data_as(dp), sd.ctypes.data_as(dp),
                exclude, zc.ctypes.data_as(dp), corr.ctypes.data_as(dp))
    return corr
