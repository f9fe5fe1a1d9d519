"""Snapshot-versioned parquet tables with TIME TRAVEL.

The lakehouse capability the partition-pruned MERGE (merge.py) trades
away: merge.py rewrites partitions IN PLACE (cheap updates, no
history); this module keeps every committed snapshot readable —
``read_version(path, n)`` is the ``VERSION AS OF n`` every table
format (Delta/Iceberg/Hudi — public designs) exposes, reduced to its
two load-bearing ideas:

1. **Immutable data directories**: version N's files live under
   ``_v{N:08d}/`` and are never modified after commit. Underscore
   prefix keeps them invisible to a naive ``spark.read`` of the root.
2. **Atomic manifest = the commit**: ``_vmanifest_{N:08d}.json`` is
   published via create-temp + rename WITHOUT overwrite, strictly
   after the data directory is fully written. A table's state is
   therefore defined purely by which manifests exist:

   - crash BEFORE the manifest → an orphan data directory readers can
     never see (``vacuum_versions`` garbage-collects it);
   - crash AFTER → the version is fully committed;
   - two concurrent writers racing the same version number → the
     rename-without-overwrite makes exactly one win; the loser
     observes the taken manifest and retries on the next number
     (optimistic concurrency, the Delta protocol's core rule).

Snapshot writes are table-level copy-on-write: an upsert reads the
latest snapshot, applies the batch, writes a FULL new snapshot. That
is O(table) write amplification — the price of O(1) time travel to
any retained version; for partition-local updates without history,
``merge.py:upsert_partitioned`` is the cheaper primitive. At 100 TB
the two compose: hot partitions via merge.py, periodic immutable
snapshots via this module for reproducible training-data pinning
("the corpus exactly as the 2024-06 run saw it").

Reference lineage: the reference engine has no storage layer at all
(HDFS text in/out, Readme.md:12-47); both maintenance primitives are
north-star extensions.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .merge import _fs, _hpath, _list_names, _read_file

_DATA_PREFIX = "_v"
_MANIFEST_PREFIX = "_vmanifest_"


def _version_of(name: str) -> int | None:
    if name.startswith(_MANIFEST_PREFIX) and name.endswith(".json"):
        try:
            return int(name[len(_MANIFEST_PREFIX) : -len(".json")])
        except ValueError:
            return None
    return None


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending (a data dir without its manifest
    is an uncommitted orphan and is NOT listed)."""
    out = []
    for name, is_dir in _list_names(spark, path):
        v = None if is_dir else _version_of(name)
        if v is not None:
            out.append(v)
    return sorted(out)


def _publish_manifest(spark: SparkSession, path: str, data: bytes) -> bool:
    """Atomic create-if-absent: temp file + rename WITHOUT overwrite.
    False = another writer already committed this version number."""
    fs, hp = _fs(spark, path)
    if fs.exists(hp):
        return False
    tmp = _hpath(spark, f"{path}.tmp{uuid.uuid4().hex[:8]}")
    out = fs.create(tmp, True)
    out.write(bytearray(data))
    out.close()
    ok = fs.rename(tmp, hp)
    if not ok:
        fs.delete(tmp, False)
    return bool(ok)


def versioned_write(
    spark: SparkSession, path: str, df: DataFrame, *, max_retries: int = 10
) -> int:
    """Commit ``df`` as the next snapshot version; returns the version
    number. Data lands in a uniquely-named directory first, then the
    manifest publishes it — losing a concurrent race retries with the
    next number (the data dir is already unique, only the manifest
    moves)."""
    data_name = f"{_DATA_PREFIX}{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(f"{path}/{data_name}")
    last_err = None
    for _ in range(max_retries):
        vs = list_versions(spark, path)
        n = (vs[-1] + 1) if vs else 1
        manifest = json.dumps(
            {"version": n, "parent": (vs[-1] if vs else 0), "data_dir": data_name}
        ).encode()
        if _publish_manifest(
            spark, f"{path}/{_MANIFEST_PREFIX}{n:08d}.json", manifest
        ):
            return n
        last_err = f"version {n} taken"
    raise IOError(f"versioned_write: exhausted retries ({last_err})")


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """``VERSION AS OF``: the snapshot exactly as committed (latest
    when ``version`` is None). Raises on unknown/vacuumed versions."""
    vs = list_versions(spark, path)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    n = vs[-1] if version is None else version
    if n not in vs:
        raise FileNotFoundError(
            f"version {n} not present under {path} (have {vs})"
        )
    m = json.loads(
        _read_file(spark, f"{path}/{_MANIFEST_PREFIX}{n:08d}.json").decode()
    )
    return spark.read.parquet(f"{path}/{m['data_dir']}")


def versioned_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: "list[str]",
    *,
    max_retries: int = 10,
) -> int:
    """Snapshot upsert: latest version with ``updates``' keys replaced
    (anti-join) plus the update rows, committed as a new version. The
    previous snapshot stays readable — this is the history-preserving
    sibling of ``upsert_partitioned``."""
    base = read_version(spark, path)
    merged = base.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(updates)
    return versioned_write(spark, path, merged, max_retries=max_retries)


def vacuum_versions(
    spark: SparkSession, path: str, *, keep_last: int = 1, remove_orphans: bool = False
) -> "list[str]":
    """Garbage-collect: drop all but the newest ``keep_last`` committed
    versions (manifest first, then its data dir — a reader racing the
    vacuum sees a missing version, never a torn one). With
    ``remove_orphans=True`` also remove data directories no manifest
    references (crashed pre-commit writers) — OFF by default because
    an uncommitted directory can belong to a LIVE concurrent writer
    about to publish its manifest (the same live-writer hazard
    merge.py's auto-recovery deliberately avoids); only enable when no
    writer can be running. Returns the removed names."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = list_versions(spark, path)
    keep = set(vs[-keep_last:])
    removed = []
    fs, _ = _fs(spark, path)
    # two passes: learn every KEPT version's data dir first, so a data
    # directory shared by a kept and a dropped manifest (possible after
    # hand-healed races) is never deleted out from under the kept one
    dirs = {
        n: json.loads(
            _read_file(spark, f"{path}/{_MANIFEST_PREFIX}{n:08d}.json").decode()
        )["data_dir"]
        for n in vs
    }
    referenced = {dirs[n] for n in keep}
    for n in vs:
        if n in keep:
            continue
        fs.delete(_hpath(spark, f"{path}/{_MANIFEST_PREFIX}{n:08d}.json"), False)
        if dirs[n] not in referenced:
            fs.delete(_hpath(spark, f"{path}/{dirs[n]}"), True)
        removed.append(f"v{n}")
    if remove_orphans:
        for name, is_dir in _list_names(spark, path):
            if is_dir and name.startswith(_DATA_PREFIX) and name not in referenced:
                fs.delete(_hpath(spark, f"{path}/{name}"), True)
                removed.append(name)
    return removed
