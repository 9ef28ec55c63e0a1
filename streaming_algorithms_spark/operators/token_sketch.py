"""Token-level sketch building — the per-lang heavy-hitter / distinct-token
workload from the north star ("per-lang heavy-hitter token frequencies").

Per Arrow batch (all vectorized / C-level, no per-row Python):
    split          python-C str.split per doc (~15 us/doc)
    factorize      pandas C hash table: token -> code, counts via bincount
                   (Zipf tokens => uniques are ~3% of occurrences)
    hash           vectorized XXH64 over the UNIQUE tokens only
    update         CMS scatter-add + HLL register max on the hash array

This is the compute-dense kernel used for the scaling-efficiency measurement
(bench.py): its cost is ~50 us/doc of process-local CPU, which parallelizes
cleanly across python workers — unlike raw-scan-bound jobs that saturate the
sandbox VM's memory bandwidth (see BASELINE.md bench notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sketches import CountMinSketch, HyperLogLog
from ..sketches.xxhash import xxh64_batch
from .sketch_agg import build_partials, merge_partials


class TokenSketch:
    """Mergeable pair: CMS of token frequencies + HLL of distinct tokens."""

    def __init__(self, epsilon: float = 1e-4, delta: float = 0.01, p: int = 14):
        self.cms = CountMinSketch(epsilon, delta)
        self.hll = HyperLogLog(p)
        self.total_tokens = 0

    def update_texts(self, texts: np.ndarray) -> None:
        toks: list = []
        for t in texts:
            toks.extend(t.split())
        if not toks:
            return
        codes, uniques = pd.factorize(np.asarray(toks, dtype=object), sort=False)
        counts = np.bincount(codes)
        h = xxh64_batch([s.encode() for s in uniques])
        self.cms.update_hashes(h, counts)
        self.hll.add_hashes(h)
        self.total_tokens += len(toks)

    def merge(self, other: "TokenSketch") -> "TokenSketch":
        self.cms.merge(other.cms)
        self.hll.merge(other.hll)
        self.total_tokens += other.total_tokens
        return self

    def to_bytes(self) -> bytes:
        c = self.cms.to_bytes()
        h = self.hll.to_bytes()
        head = np.array([self.cms.width, self.cms.depth], "<u4").tobytes()
        return (
            head
            + self.total_tokens.to_bytes(8, "little")
            + len(c).to_bytes(8, "little") + c
            + len(h).to_bytes(8, "little") + h
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TokenSketch":
        w, d = np.frombuffer(buf[:8], "<u4")
        sk = cls.__new__(cls)
        sk.total_tokens = int.from_bytes(buf[8:16], "little")
        off = 16
        n = int.from_bytes(buf[off:off + 8], "little"); off += 8
        sk.cms = CountMinSketch.from_bytes(buf[off:off + n], width=int(w), depth=int(d))
        off += n
        n = int.from_bytes(buf[off:off + 8], "little"); off += 8
        sk.hll = HyperLogLog.from_bytes(buf[off:off + n])
        return sk


def token_sketch_build(df: DataFrame, keys, text_col: str = "text",
                       epsilon: float = 1e-4, delta: float = 0.01,
                       p: int = 14) -> DataFrame:
    """Per-key token CMS + distinct-token HLL over a text column.
    Output: keys + (distinct_tokens, total_tokens, rows_seen)."""

    def update(sk: TokenSketch, pdf: pd.DataFrame) -> None:
        sk.update_texts(pdf[text_col].astype(str).to_numpy())

    from .sketch_agg import ensure_parallelism
    from pyspark.sql import functions as F

    # NULL text contributes no tokens (SQL aggregate semantics — astype(str)
    # would otherwise count a phantom 'None' token); spread the CPU-bound
    # tokenize+hash stage like every other sketch operator
    src = ensure_parallelism(
        df.select(*keys, text_col).filter(F.col(text_col).isNotNull())
    )
    partials = build_partials(
        src, keys,
        lambda: TokenSketch(epsilon, delta, p), update,
    )
    return merge_partials(
        partials, keys, TokenSketch.from_bytes,
        lambda sk, rows: {
            "distinct_tokens": int(round(sk.hll.estimate())),
            "total_tokens": sk.total_tokens,
            "rows_seen": rows,
        },
        "distinct_tokens bigint, total_tokens bigint, rows_seen bigint",
    )
