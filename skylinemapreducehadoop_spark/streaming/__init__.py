from skylinemapreducehadoop_spark.streaming.incremental import (
    SkylineAccumulator,
    hourly_rollup,
    incremental_skyline,
    incremental_skyline_foreachbatch,
)

__all__ = [
    "SkylineAccumulator",
    "hourly_rollup",
    "incremental_skyline",
    "incremental_skyline_foreachbatch",
]
