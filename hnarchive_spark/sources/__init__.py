from hnarchive_spark.sources.hn_api import (
    FetchBackoff,
    IdleBackoff,
    MockTransport,
    fetch_items,
)
from hnarchive_spark.sources.items_store import ItemsStore

__all__ = [
    "FetchBackoff",
    "IdleBackoff",
    "MockTransport",
    "fetch_items",
    "ItemsStore",
]
