"""Streaming distribution-drift detection — the reference workload's alert
(heka_message_monitor.lua:328-358,601-613): keep a per-key float matrix of
interval x histogram-bucket snapshots; each interval, Pearson-correlate the
newest snapshot against every previous one (Matrix.pcc); if the best
correlation is <= threshold the distribution drifted.

State = the serialized Matrix (float variant, NaN = unwritten interval row)
carried in ``applyInPandasWithState`` — the luasandbox preserve_data
equivalent, checkpointed by Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches import Matrix, P2Histogram


def histogram_snapshot(values: np.ndarray, buckets: int = 8) -> np.ndarray:
    """P² equiprobable histogram markers for one interval's values
    (the reference snapshots P² marker positions into the matrix row)."""
    h = P2Histogram(buckets)
    for v in values:
        h.add(float(v))
    return np.array([h.estimate(m) for m in range(buckets + 1)], np.float32)


def streaming_drift_detector(stream: DataFrame, key_col: str, value_col: str,
                             buckets: int = 8, max_intervals: int = 32,
                             threshold: float = 0.3) -> DataFrame:
    """Per key and micro-batch: snapshot the value distribution, pcc against
    history, emit (key, interval, best_corr, drifted)."""

    out_schema = (
        f"`{key_col}` string, interval long, best_corr double, drifted boolean"
    )
    state_schema = "matrix binary, interval long"

    def update_fn(key, pdfs, state: GroupState):
        if state.exists:
            buf, interval = state.get
            m = Matrix.from_bytes(bytes(buf), dtype="float")
        else:
            m = Matrix(max_intervals, buckets + 1, "float")
            interval = 0
        vals = np.concatenate(
            [pdf[value_col].to_numpy(np.float64) for pdf in pdfs]
        ) if pdfs else np.empty(0)
        if vals.size < buckets + 1:  # not enough to fill the P2 markers
            state.update((m.to_bytes(), interval))
            return
        row = interval % max_intervals
        snap = histogram_snapshot(vals, buckets)
        for c, v in enumerate(snap):
            m.set(row, c, v)
        best = m.pcc(row, "max")
        coef = float(best[0]) if best is not None else float("nan")
        drifted = bool(best is not None and coef <= threshold)
        interval += 1
        state.update((m.to_bytes(), interval))
        yield pd.DataFrame(
            {key_col: [key[0]], "interval": [interval - 1],
             "best_corr": [coef], "drifted": [drifted]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update_fn, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout,
        )
    )
