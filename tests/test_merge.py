"""Partition-pruned parquet upsert (sources/merge.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.sources.merge import upsert_partitioned


def _build_table(spark, path):
    rows = [(p, i, f"v{p}_{i}") for p in range(5) for i in range(10)]
    df = spark.createDataFrame(rows, "part int, id int, val string")
    df.write.partitionBy("part").parquet(path)


def _part_files(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("part="):
            full = os.path.join(path, d)
            out[d] = {
                f: os.stat(os.path.join(full, f)).st_mtime_ns
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out

def test_upsert_replaces_inserts_and_leaves_other_partitions_untouched(
    spark, tmp_path
):
    path = str(tmp_path / "tbl")
    _build_table(spark, path)
    before = _part_files(path)

    updates = spark.createDataFrame(
        [(1, 3, "UPDATED"), (1, 99, "NEW"), (4, 0, "UPDATED4")],
        "part int, id int, val string",
    )
    touched = upsert_partitioned(spark, path, updates, ["part", "id"], "part")
    assert touched == 2

    after_df = spark.read.parquet(path)
    got = {(r["part"], r["id"]): r["val"] for r in after_df.collect()}
    assert got[(1, 3)] == "UPDATED"        # replaced
    assert got[(1, 99)] == "NEW"           # inserted
    assert got[(4, 0)] == "UPDATED4"
    assert got[(1, 4)] == "v1_4"           # untouched key in touched partition
    assert got[(2, 5)] == "v2_5"           # untouched partition intact
    assert len(got) == 51                  # 50 original + 1 insert

    # untouched partitions' FILES are byte-identical (same mtimes) —
    # the write really was partition-pruned
    after = _part_files(path)
    for d in ("part=0", "part=2", "part=3"):
        assert after[d] == before[d], d
    assert after["part=1"] != before["part=1"]


def test_upsert_partition_read_is_pruned(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    _build_table(spark, path)
    # the pruned read carries a PartitionFilters entry at plan time
    pruned = spark.read.parquet(path).where(F.col("part").isin([1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_upsert_guards(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    _build_table(spark, path)
    updates = spark.createDataFrame([(0, 1, "x")], "part int, id int, val string")
    with pytest.raises(ValueError):
        upsert_partitioned(spark, path, updates, [], "part")
    with pytest.raises(ValueError):
        upsert_partitioned(
            spark, path, updates, ["part", "id"], "part", max_touched_partitions=0
        )


def test_upsert_creates_missing_target(spark, tmp_path):
    # first-ever upsert into a nonexistent path = plain partitioned write
    path = str(tmp_path / "fresh")
    updates = spark.createDataFrame(
        [(0, 1, "a"), (1, 2, "b")], "part int, id int, val string"
    )
    touched = upsert_partitioned(spark, path, updates, ["part", "id"], "part")
    assert touched == 2
    got = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got == {(0, 1): "a", (1, 2): "b"}
    # and a second upsert over it merges normally
    upd2 = spark.createDataFrame([(0, 1, "a2")], "part int, id int, val string")
    assert upsert_partitioned(spark, path, upd2, ["part", "id"], "part") == 1
    got2 = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got2 == {(0, 1): "a2", (1, 2): "b"}


def test_upsert_detects_cross_partition_key_move(spark, tmp_path):
    # key (id=3) exists in part=1; an update placing it in part=2 would
    # duplicate the key (the old row's partition is never read) — the
    # optional check fails fast instead
    path = str(tmp_path / "tbl4")
    _build_table(spark, path)
    moved = spark.createDataFrame([(2, 3, "MOVED")], "part int, id int, val string")
    # key_cols here is just id: the same id exists under part=1
    with pytest.raises(ValueError, match="moves from partition"):
        upsert_partitioned(spark, path, moved, ["id"], "part", check_key_moves=True)
    # without the flag the documented precondition applies (no raise)
    upsert_partitioned(spark, path, moved, ["id"], "part")


def test_delete_partitioned_prunes_and_removes_emptied_partition(spark, tmp_path):
    from skylinemapreducehadoop_spark.sources.merge import delete_partitioned

    path = str(tmp_path / "tbl_del")
    _build_table(spark, path)
    before = _part_files(path)

    # delete two keys from part=1 and ALL keys of part=3
    keys = spark.createDataFrame(
        [(1, 3), (1, 7)] + [(3, i) for i in range(10)], "part int, id int"
    )
    touched = delete_partitioned(spark, path, keys, ["part", "id"], "part")
    assert touched == 2

    after_df = spark.read.parquet(path)
    got = {(r["part"], r["id"]) for r in after_df.collect()}
    assert (1, 3) not in got and (1, 7) not in got
    assert not any(p == 3 for p, _ in got)  # whole partition gone
    assert len(got) == 50 - 2 - 10
    # untouched partitions byte-identical; emptied directory removed
    after = _part_files(path)
    for d in ("part=0", "part=2", "part=4"):
        assert after[d] == before[d], d
    assert "part=3" not in after
    # empty key set is a no-op
    none = spark.createDataFrame([], "part int, id int")
    assert delete_partitioned(spark, path, none, ["part", "id"], "part") == 0


def test_delete_removes_emptied_partition_with_escaped_value(spark, tmp_path):
    """The emptied-partition directory is found by LISTING (the actual
    writer-escaped name), not by reconstructing `col=value` from the
    Python value — values with ':', '%', '=' and a NULL partition all
    get their stale directories removed."""
    from skylinemapreducehadoop_spark.sources.merge import delete_partitioned

    path = str(tmp_path / "tbl_esc")
    rows = [
        ("a:b", 1, "x"),
        ("a:b", 2, "y"),
        ("p%20q", 3, "z"),
        ("k=v", 4, "w"),
        (None, 5, "n"),
        ("plain", 6, "p"),
    ]
    df = spark.createDataFrame(rows, "part string, id int, val string")
    df.write.partitionBy("part").parquet(path)
    # the writer percent-escapes these — reconstructing f"part={value}"
    # would MISS every one of them
    dirs = {d for d in os.listdir(path) if d.startswith("part=")}
    assert "part=a%3Ab" in dirs and "part=__HIVE_DEFAULT_PARTITION__" in dirs

    # empty a:b and the NULL partition entirely; trim p%20q
    keys = spark.createDataFrame(
        [("a:b", 1), ("a:b", 2), (None, 5), ("p%20q", 3)], "part string, id int"
    )
    # NULL keys never equi-join: delete NULL-partition rows via id only
    touched = delete_partitioned(spark, path, keys.select("id"), ["id"], "part")
    assert touched == 3
    after = spark.read.parquet(path)
    got = {(r["part"], r["id"]) for r in after.collect()}
    assert got == {("k=v", 4), ("plain", 6)}
    dirs_after = {d for d in os.listdir(path) if d.startswith("part=")}
    assert "part=a%3Ab" not in dirs_after
    assert "part=__HIVE_DEFAULT_PARTITION__" not in dirs_after
    assert "part=p%2520q" not in dirs_after  # fully emptied too (id=3 was its only row)


def test_upsert_preserves_null_partition_rows(spark, tmp_path):
    # plain isin() never matches NULL — the NULL partition's retained
    # rows must survive an upsert that touches that partition
    path = str(tmp_path / "tbl_null")
    rows = [(None, 1, "keep"), (None, 2, "old"), ("a", 3, "a3")]
    spark.createDataFrame(rows, "part string, id int, val string").write.partitionBy(
        "part"
    ).parquet(path)
    updates = spark.createDataFrame([(None, 2, "NEW")], "part string, id int, val string")
    assert upsert_partitioned(spark, path, updates, ["id"], "part") == 1
    got = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got == {(None, 1): "keep", (None, 2): "NEW", ("a", 3): "a3"}


def _snapshot(spark, path):
    return {
        (r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()
    }


@pytest.mark.parametrize("site", ["post_staging", "post_marker", "mid_promote"])
def test_crash_consistency_upsert(spark, tmp_path, site, monkeypatch):
    """A crash at ANY protocol point leaves the table entirely old
    (before the marker) or entirely new after recovery (marker on) —
    never mixed."""
    from skylinemapreducehadoop_spark.sources import merge as merge_mod
    from skylinemapreducehadoop_spark.sources.merge import recover_partitioned

    path = str(tmp_path / f"tbl_crash_{site}")
    _build_table(spark, path)
    old = _snapshot(spark, path)

    updates = spark.createDataFrame(
        [(1, 3, "UPDATED"), (2, 0, "UPDATED2"), (1, 99, "NEW")],
        "part int, id int, val string",
    )

    calls = {"n": 0}

    def injector(s):
        if s == site:
            calls["n"] += 1
            # mid_promote fires once per staged dir: crash on the 2nd,
            # leaving one partition promoted and one not
            if site != "mid_promote" or calls["n"] == 2:
                raise RuntimeError(f"injected crash at {s}")

    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", injector)
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert_partitioned(spark, path, updates, ["part", "id"], "part")
    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", None)

    status = recover_partitioned(spark, path)
    got = _snapshot(spark, path)
    if site == "post_staging":
        # crash before the marker: rolled back, table is the OLD state
        assert status == "rolled_back"
        assert got == old
    else:
        # marker was durable: rolled forward, table is the NEW state
        assert status == "rolled_forward"
        new = dict(old)
        new[(1, 3)] = "UPDATED"
        new[(2, 0)] = "UPDATED2"
        new[(1, 99)] = "NEW"
        assert got == new
    # no protocol litter left behind
    litter = [
        d
        for d in os.listdir(path)
        if d.startswith(("_skymr_commit_", "_skymr_staging_", "_skymr_trash_"))
    ]
    assert litter == []
    # and a re-run of recovery is a no-op
    assert recover_partitioned(spark, path) == "none"


def test_crash_consistency_delete_emptied_partition(spark, tmp_path, monkeypatch):
    # crash after the marker, before the delete-only dir removal: the
    # emptied partition must still disappear on recovery
    from skylinemapreducehadoop_spark.sources import merge as merge_mod
    from skylinemapreducehadoop_spark.sources.merge import (
        delete_partitioned,
        recover_partitioned,
    )

    path = str(tmp_path / "tbl_crash_del")
    _build_table(spark, path)
    keys = spark.createDataFrame(
        [(3, i) for i in range(10)] + [(1, 0)], "part int, id int"
    )

    def injector(s):
        if s == "post_marker":
            raise RuntimeError("injected crash at post_marker")

    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", injector)
    with pytest.raises(RuntimeError, match="injected crash"):
        delete_partitioned(spark, path, keys, ["part", "id"], "part")
    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", None)

    assert recover_partitioned(spark, path) == "rolled_forward"
    got = {(r["part"], r["id"]) for r in spark.read.parquet(path).collect()}
    assert not any(p == 3 for p, _ in got)
    assert (1, 0) not in got
    assert len(got) == 50 - 10 - 1
    assert "part=3" not in os.listdir(path)


def test_auto_recovery_leaves_concurrent_writers_staging_alone(spark, tmp_path):
    """Entry-point auto-recovery must NOT garbage-collect an unmarked
    staging directory — it could belong to a live concurrent writer
    mid-stage (deleting it would turn that writer's later commit into
    partition deletion). Only an explicit recover_partitioned() call
    cleans unmarked leftovers."""
    from skylinemapreducehadoop_spark.sources.merge import recover_partitioned

    path = str(tmp_path / "tbl_conc")
    _build_table(spark, path)
    # simulate another writer mid-stage: unmarked staging with data
    foreign = os.path.join(path, "_skymr_staging_deadbeef0000")
    os.makedirs(os.path.join(foreign, "part=7"))
    with open(os.path.join(foreign, "part=7", "x.parquet"), "wb") as f:
        f.write(b"not really parquet")

    updates = spark.createDataFrame([(1, 3, "U")], "part int, id int, val string")
    assert upsert_partitioned(spark, path, updates, ["part", "id"], "part") == 1
    # the foreign staging survived the auto-heal...
    assert os.path.isdir(foreign)
    got = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got[(1, 3)] == "U" and len(got) == 50
    # ...and the explicit administrative call rolls it back
    assert recover_partitioned(spark, path) == "rolled_back"
    assert not os.path.isdir(foreign)


def _no_litter(path):
    return [
        d
        for d in os.listdir(path)
        if d.startswith(("_skymr_commit_", "_skymr_staging_", "_skymr_trash_"))
    ] == []


def test_two_concurrent_writers_disjoint_partitions(spark, tmp_path, monkeypatch):
    """The supported concurrency contract: writers upserting DISJOINT
    partition sets may interleave arbitrarily. Interleaving proved
    here: A stages (crash-paused before its marker), B stages AND
    commits while A's staging sits in the table root, then A resumes
    and commits. Both commits land, untouched partitions stay
    byte-identical, and recovery afterwards touches nothing."""
    from skylinemapreducehadoop_spark.sources import merge as merge_mod
    from skylinemapreducehadoop_spark.sources.merge import recover_partitioned

    path = str(tmp_path / "tbl_two_writers")
    _build_table(spark, path)
    before = _part_files(path)

    # writer A: stage updates to part=1, pause before the marker
    upd_a = spark.createDataFrame([(1, 3, "A_UPD")], "part int, id int, val string")

    def pause_post_staging(s):
        if s == "post_staging":
            raise RuntimeError("pause A")

    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", pause_post_staging)
    with pytest.raises(RuntimeError, match="pause A"):
        upsert_partitioned(spark, path, upd_a, ["part", "id"], "part")
    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", None)
    stagings = [d for d in os.listdir(path) if d.startswith("_skymr_staging_")]
    assert len(stagings) == 1
    staging_a = stagings[0]

    # writer B: full upsert of part=3 while A's staging is live
    upd_b = spark.createDataFrame([(3, 0, "B_UPD")], "part int, id int, val string")
    assert upsert_partitioned(spark, path, upd_b, ["part", "id"], "part") == 1
    assert os.path.isdir(os.path.join(path, staging_a))  # B left A's staging alone

    # writer A resumes: marker + promote of its already-staged data
    merge_mod._commit(spark, path, staging_a, [])

    got = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got[(1, 3)] == "A_UPD" and got[(3, 0)] == "B_UPD"
    assert len(got) == 50
    after = _part_files(path)
    for d in ("part=0", "part=2", "part=4"):
        assert after[d] == before[d], d
    assert _no_litter(path)
    assert recover_partitioned(spark, path) == "none"


@pytest.mark.parametrize("race_site", ["mid_promote", "post_trash"])
def test_concurrent_promoter_race_preserves_promoted_partition(
    spark, tmp_path, monkeypatch, race_site
):
    """The r9 ADVICE data-loss mode: writer B's auto-recovery rolls a
    marked commit forward CONCURRENTLY with writer A's own promotion.
    Deterministically interleaved via the fault hook: at ``race_site``
    (B has listed the staging / has parked dest in trash), A completes
    the ENTIRE promotion; B then resumes with its stale view. B must
    skip (src gone) or tolerate its lost rename (src gone + dest
    present) — under the old delete-then-rename ordering B deleted the
    freshly promoted partition and then had nothing to rename."""
    from skylinemapreducehadoop_spark.sources import merge as merge_mod
    from skylinemapreducehadoop_spark.sources.merge import recover_partitioned

    path = str(tmp_path / f"tbl_race_{race_site}")
    _build_table(spark, path)
    upd = spark.createDataFrame(
        [(1, 3, "RACE_UPD"), (2, 0, "RACE_UPD2")], "part int, id int, val string"
    )

    # crash writer A right after its marker: staging + marker durable,
    # nothing promoted yet
    def crash_post_marker(s):
        if s == "post_marker":
            raise RuntimeError("crash A")

    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", crash_post_marker)
    with pytest.raises(RuntimeError, match="crash A"):
        upsert_partitioned(spark, path, upd, ["part", "id"], "part")
    staging = [d for d in os.listdir(path) if d.startswith("_skymr_staging_")][0]

    # B rolls forward; at the first race_site hit, A promotes everything
    state = {"fired": False}

    def a_promotes_midway(s):
        if s == race_site and not state["fired"]:
            state["fired"] = True
            merge_mod._FAULT_INJECTOR = None
            merge_mod._roll_forward(spark, path, staging, [])
            merge_mod._FAULT_INJECTOR = a_promotes_midway

    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", a_promotes_midway)
    assert recover_partitioned(spark, path) == "rolled_forward"  # B, no error
    monkeypatch.setattr(merge_mod, "_FAULT_INJECTOR", None)
    assert state["fired"]

    got = {(r["part"], r["id"]): r["val"] for r in spark.read.parquet(path).collect()}
    assert got[(1, 3)] == "RACE_UPD" and got[(2, 0)] == "RACE_UPD2"
    assert len(got) == 50  # nothing lost
    assert _no_litter(path)
    assert recover_partitioned(spark, path) == "none"
