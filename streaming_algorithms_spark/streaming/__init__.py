from .stateful import streaming_hll_distinct, streaming_windowed_stats

__all__ = ["streaming_hll_distinct", "streaming_windowed_stats"]
