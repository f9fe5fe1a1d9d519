from skylinemapreducehadoop_spark.streaming.incremental import (
    SkylineAccumulator,
    enrich_stream,
    hourly_rollup,
    incremental_skyline,
    incremental_skyline_foreachbatch,
    session_rollup,
)
from skylinemapreducehadoop_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_seen_filter,
)

__all__ = [
    "SkylineAccumulator",
    "enrich_stream",
    "hourly_rollup",
    "incremental_skyline",
    "incremental_skyline_foreachbatch",
    "session_rollup",
    "streaming_exact_dedup",
    "streaming_seen_filter",
]
