from skylinemapreducehadoop_spark.operators.skyline import (
    skyline,
    skyline_by,
    skyline_layers,
)

__all__ = ["skyline", "skyline_by", "skyline_layers"]
