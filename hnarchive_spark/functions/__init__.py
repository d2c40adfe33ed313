from hnarchive_spark.functions.scalars import (
    display_date,
    fix_ptags,
    hn_item_url,
    hn_user_url,
)

__all__ = ["fix_ptags", "display_date", "hn_item_url", "hn_user_url"]
