"""Structured Streaming surface (SURVEY.md §2.8, §7 step 13) — net-new:
the reference is batch-only; these operators are built on Spark's
watermark/window/stateful primitives over the same tables.
"""

from nutch_spark.streaming.continuous import (
    continuous_crawl,
    fetch_parse_join,
    fetch_rate_windows,
    streaming_hostdb,
    streaming_dedup,
    streaming_clean,
    streaming_embed_dedup,
    streaming_image_dedup,
    streaming_image_near_dup,
    streaming_video_dedup,
)

__all__ = ["continuous_crawl", "fetch_parse_join", "fetch_rate_windows", "streaming_clean", "streaming_dedup", "streaming_embed_dedup", "streaming_hostdb", "streaming_image_dedup", "streaming_image_near_dup", "streaming_video_dedup"]
