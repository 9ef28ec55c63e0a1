"""Pure-numpy mergeable sketch kernels (no Spark dependency).

Each sketch is a commutative monoid: ``zero`` (constructor), vectorized
``update_batch``, associative ``merge``, and a little-endian ``to_bytes`` /
``from_bytes`` codec so partials travel as BinaryType columns.
"""

from .bloom import BloomFilter
from .bottomk import BottomKSample, theta_set_estimates
from .cm_sketch import CountMinSketch, key_bytes
from .count_sketch import CountSketch
from .cuckoo import CuckooFilter
from .frequent_directions import FrequentDirections
from .hll import HyperLogLog
from .kll import KLL
from .matrix import Matrix
from .p2 import P2Histogram, P2Quantile
from .running_stats import RunningStats
from .space_saving import SpaceSaving
from .tdigest import TDigest
from .time_series import TimeSeries, anomaly_from_profile, matrix_profile
from .xxhash import xxh32, xxh32_batch, xxh64, xxh64_batch

__all__ = [
    "BloomFilter",
    "BottomKSample",
    "theta_set_estimates",
    "CountSketch",
    "CuckooFilter",
    "FrequentDirections",
    "SpaceSaving",
    "TDigest",
    "CountMinSketch",
    "HyperLogLog",
    "KLL",
    "Matrix",
    "P2Histogram",
    "P2Quantile",
    "RunningStats",
    "TimeSeries",
    "anomaly_from_profile",
    "matrix_profile",
    "key_bytes",
    "xxh32",
    "xxh32_batch",
    "xxh64",
    "xxh64_batch",
]
