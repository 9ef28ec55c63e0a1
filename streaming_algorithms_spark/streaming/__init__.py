from .ingest import (
    AppendRoute,
    epoch_batch_id,
    exactly_once_append,
    ingest_stream,
)
from .stateful import (
    streaming_bloom_dedup,
    streaming_hll_distinct,
    streaming_kll_quantiles,
    streaming_multi_sketch,
    streaming_windowed_stats,
)

__all__ = ["AppendRoute", "epoch_batch_id", "exactly_once_append",
           "ingest_stream", "streaming_bloom_dedup",
           "streaming_hll_distinct", "streaming_kll_quantiles",
           "streaming_multi_sketch", "streaming_windowed_stats"]
