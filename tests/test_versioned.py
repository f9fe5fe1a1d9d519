"""Snapshot versioning / time travel: commit atomicity, history reads,
optimistic concurrency, vacuum semantics."""

from __future__ import annotations

import tempfile

import pytest

from skylinemapreducehadoop_spark.sources.versioned import (
    list_versions,
    read_version,
    vacuum_versions,
    versioned_upsert,
    versioned_write,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_roundtrip_upsert_and_time_travel(spark):
    path = tempfile.mkdtemp(prefix="vtbl_") + "/tbl"
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert versioned_write(spark, path, df1) == 1
    up = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    assert versioned_upsert(spark, path, up, ["k"]) == 2
    assert list_versions(spark, path) == [1, 2]
    assert _rows(read_version(spark, path)) == {(1, "a"), (2, "B"), (3, "c")}
    # time travel: version 1 unchanged by the upsert
    assert _rows(read_version(spark, path, 1)) == {(1, "a"), (2, "b")}
    with pytest.raises(FileNotFoundError):
        read_version(spark, path, 7)
    with pytest.raises(FileNotFoundError):
        read_version(spark, tempfile.mkdtemp(prefix="vempty_"))


def test_uncommitted_orphan_is_invisible_and_vacuum(spark):
    import os

    path = tempfile.mkdtemp(prefix="vtbl_") + "/tbl"
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    versioned_write(spark, path, df1)
    # a crashed writer: data directory present, manifest never published
    df1.write.mode("overwrite").parquet(path + "/_vdeadbeef0000")
    assert list_versions(spark, path) == [1]
    assert _rows(read_version(spark, path)) == {(1, "a")}
    # default vacuum keeps the orphan (live-writer hazard documented)
    removed = vacuum_versions(spark, path, keep_last=1)
    assert removed == [] and os.path.isdir(path + "/_vdeadbeef0000")
    removed = vacuum_versions(spark, path, keep_last=1, remove_orphans=True)
    assert removed == ["_vdeadbeef0000"]
    # history trim: after a second version, keep_last=1 drops v1
    versioned_write(spark, path, df1.withColumn("v", df1.v))
    assert vacuum_versions(spark, path, keep_last=1) == ["v1"]
    assert list_versions(spark, path) == [2]
    with pytest.raises(FileNotFoundError):
        read_version(spark, path, 1)
    with pytest.raises(ValueError):
        vacuum_versions(spark, path, keep_last=0)


def test_optimistic_concurrency_version_race(spark):
    import json

    from skylinemapreducehadoop_spark.sources.versioned import (
        _MANIFEST_PREFIX,
        _publish_manifest,
    )

    path = tempfile.mkdtemp(prefix="vtbl_") + "/tbl"
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    versioned_write(spark, path, df1)
    # a rival writer publishes version 2 first (reuse v1's data dir as
    # a stand-in committed snapshot)
    m1 = json.loads(
        open(path + f"/{_MANIFEST_PREFIX}00000001.json", "rb").read()
    )
    rival = json.dumps(
        {"version": 2, "parent": 1, "data_dir": m1["data_dir"]}
    ).encode()
    assert _publish_manifest(
        spark, path + f"/{_MANIFEST_PREFIX}00000002.json", rival
    )
    # publishing the SAME version again must lose the race
    assert not _publish_manifest(
        spark, path + f"/{_MANIFEST_PREFIX}00000002.json", rival
    )
    # our writer retries past the taken number and lands on 3
    assert versioned_write(spark, path, df1) == 3
    assert list_versions(spark, path) == [1, 2, 3]


def test_vacuum_never_deletes_shared_data_dir(spark):
    import json

    from skylinemapreducehadoop_spark.sources.versioned import (
        _MANIFEST_PREFIX,
        _publish_manifest,
    )

    path = tempfile.mkdtemp(prefix="vtbl_") + "/tbl"
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    versioned_write(spark, path, df1)
    # v2 shares v1's data dir (a hand-healed race can produce this)
    m1 = json.loads(open(path + f"/{_MANIFEST_PREFIX}00000001.json", "rb").read())
    assert _publish_manifest(
        spark,
        path + f"/{_MANIFEST_PREFIX}00000002.json",
        json.dumps({"version": 2, "parent": 1, "data_dir": m1["data_dir"]}).encode(),
    )
    assert vacuum_versions(spark, path, keep_last=1) == ["v1"]
    # the kept v2 must still read: its (shared) data dir survived
    assert _rows(read_version(spark, path, 2)) == {(1, "a")}
