"""SparkSession factory tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions sized to cores (not the 200 default), AQE on for runtime
re-planning (skew joins, partition coalescing), Arrow on for the pandas
UDF path, UTC session timezone so timestamp semantics match columnar
readers (e.g. the DuckDB correctness oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Default driver heap: ~40% of physical RAM, clamped to [2g, 48g].

    A fixed large default (the old 48g) is right for the 128 GiB bench
    machine but can swap or invoke the OOM killer on small hosts; a
    fixed small default GC-thrashes 32 local executor threads at the
    10x scale probe. Deriving from the host keeps both safe.
    ``SPARK_GRAFT_DRIVER_MEM`` overrides (see README).
    """
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        gib = int(total * 0.4 / (1 << 30))
    except (ValueError, OSError, AttributeError):
        gib = 4
    return f"{max(2, min(48, gib))}g"


def get_session(
    app_name: str = "skyline-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` (default 32) controls local parallelism; on a
    real cluster callers pass ``master=None`` and let spark-submit
    decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # In local/client mode the driver JVM heap is fixed BEFORE
    # SparkSession.builder configs apply — a plain `python script.py`
    # launch otherwise runs 32 executor threads on the 1 GB default
    # heap (observed: GC-thrash + OOM at a 10x data probe). Setting
    # PYSPARK_SUBMIT_ARGS before the gateway starts is the documented
    # client-mode channel; respect an operator-provided value and do
    # nothing once a JVM exists (spark-submit sets the env itself).
    from pyspark import SparkContext

    if (
        SparkContext._active_spark_context is None
        and "PYSPARK_SUBMIT_ARGS" not in os.environ
    ):
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem()
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {mem} pyspark-shell"
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) columns (the events table) read as
        # long nanoseconds instead of erroring; loaders cast to a
        # microsecond timestamp (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet timestamp[us] without timezone reads as TimestampType,
        # not TIMESTAMP_NTZ (the PySpark 4.1 inference default), so
        # unix_micros/window logic sees one timestamp type everywhere.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # NOTE: the local testdata parquet files are single-row-group,
        # so spark.sql.files.maxPartitionBytes cannot add scan
        # parallelism here (a row group is the minimum split). CPU-bound
        # kernel stages fan out explicitly where it pays (see
        # operators/skyline.py, operators/dedup.py), and the one
        # single-file TEXT ingest fans out at its own call site
        # (sources/gsod.py) — a session-global
        # spark.sql.files.minPartitionNum floor was measured to tax
        # EVERY tiny parquet scan with cpu-count planned splits
        # (~0.1-0.5s/query across the whole bench) for the benefit of
        # that one reader.
        # Allow shuffled-hash join where its size conditions are met
        # (guide §3.1): no sort on either side; AQE's runtime size
        # checks + skew-join splitting still govern, so a build side
        # that cannot fit a partition falls back safely. Measured on
        # the TPC-H family: q18 1.65->1.23s, q3 1.08->0.75s, q21
        # 1.33->1.14s, setsim 5.2->4.7s, zero regressions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Long-lived sessions (the 200+-query bench sweep, the oracle
        # harness) accumulate shuffle files and localCheckpoint blocks
        # whose RDDs are unreachable but not yet JVM-GC'd; the context
        # cleaner only runs on GC. The default 30min periodic GC lets
        # tens of GB of dead shuffle state pile up inside one session
        # (observed: a 30x-replica iterative probe exhausting /tmp).
        # 5min bounds the pile without measurable query-time cost.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
