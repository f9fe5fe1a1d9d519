from skylinemapreducehadoop_spark.sources.tables import load_table, load_tables
from skylinemapreducehadoop_spark.sources.gsod import (
    GSOD_SKYLINE_DIMS,
    nullify_sentinels,
    read_gsod,
)
from skylinemapreducehadoop_spark.sources.sinks import (
    write_csv,
    write_parquet,
    write_skyline_outputs,
)
from skylinemapreducehadoop_spark.sources.bucketing import (
    bucketed_join,
    read_bucketed,
    write_bucketed,
)

__all__ = [
    "write_bucketed",
    "read_bucketed",
    "bucketed_join",
    "load_table",
    "load_tables",
    "read_gsod",
    "nullify_sentinels",
    "GSOD_SKYLINE_DIMS",
    "write_csv",
    "write_parquet",
    "write_skyline_outputs",
]
