from hnarchive_spark.streaming.livestream import (
    SkipPolicy,
    livestream_batches,
    update,
    update_items,
)

__all__ = ["SkipPolicy", "livestream_batches", "update", "update_items"]
