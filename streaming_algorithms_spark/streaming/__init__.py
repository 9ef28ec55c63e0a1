from .stateful import (
    streaming_bloom_dedup,
    streaming_hll_distinct,
    streaming_kll_quantiles,
    streaming_multi_sketch,
    streaming_windowed_stats,
)

__all__ = ["streaming_bloom_dedup", "streaming_hll_distinct",
           "streaming_kll_quantiles", "streaming_multi_sketch",
           "streaming_windowed_stats"]
