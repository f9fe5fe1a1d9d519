"""Partition-pruned MERGE (upsert) / DELETE into partitioned parquet
with a crash-consistent stage-and-promote commit protocol.

Plain parquet has no transaction log, so a naive upsert rewrites the
whole table. This primitive implements the pattern every lakehouse
engine (Delta/Iceberg/Hudi — public designs) reduces to for
partition-aligned updates:

1. project the DISTINCT partition values present in the updates (a
   driver collect bounded by the update batch's partition spread,
   never the table);
2. read ONLY those partitions of the target (the pruning filter is a
   plan-time PartitionFilter — untouched directories are never even
   listed);
3. anti-join out the keys being replaced, union the updates;
4. write the merged partitions to a STAGING directory inside the
   table root (underscore-prefixed, so readers ignore it), then
   atomically publish a commit MARKER and promote each staged
   partition directory into place by rename. Untouched partition
   FILES are left byte-identical on disk (asserted by mtime in
   tests).

Crash consistency (the commit protocol):

- The marker (``_skymr_commit_<txid>.json``) is written via
  create-temp + rename, so it is either fully present or absent.
- A crash BEFORE the marker leaves the table untouched (the staging
  directory is invisible to readers; an explicit
  :func:`recover_partitioned` call garbage-collects it as a rollback —
  the entry points' AUTO-recovery deliberately leaves unmarked
  stagings alone, since one could belong to a concurrent live writer).
- A crash AFTER the marker is rolled FORWARD by
  :func:`recover_partitioned`: promotion is idempotent — a staged
  partition still present in staging has provably not been renamed
  yet (rename removes its source), so recovery parks the stale target
  directory under an underscore-prefixed trash name, renames the
  staged one in, and drops the trash; partitions already promoted are
  skipped; delete-only directories (partitions emptied by a DELETE)
  are removed idempotently. Because the old directory is moved aside
  rather than deleted in place, a CONCURRENT promoter racing the same
  marker (a second writer's auto-recovery vs the first writer's own
  promotion) can never destroy a freshly promoted partition — the
  loser of the rename race observes src-gone/dest-present and skips.
  After recovery the table is entirely old or entirely new, never
  mixed. Both entry points auto-run the roll-forward-only recovery
  first, so an earlier crashed writer's marked commit is healed
  before new work.
- Partition DIRECTORY names are never reconstructed from values:
  staged names come from listing what Spark's own writer produced,
  and to-delete names from listing the files the pruned scan actually
  read (``input_file_name()``), so Hive percent-escaping, NULL
  partitions (``__HIVE_DEFAULT_PARTITION__``) and type serialization
  are always exactly the writer's own.

The per-directory rename is atomic on HDFS and POSIX filesystems. On
an object store without atomic rename (S3) this degrades to
copy+delete — there you want a real table format; the pruning and
merge PLAN here are identical to what those formats execute.

At 100 TB an upsert costs O(touched partitions), not O(table), and a
crashed writer costs one recovery scan of the table root listing.
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MARKER_PREFIX = "_skymr_commit_"
_STAGING_PREFIX = "_skymr_staging_"

# test-only fault injection: callable(site: str) that raises to simulate
# a crash at a protocol boundary ("post_staging", "post_marker",
# "mid_promote"). Never set outside tests.
_FAULT_INJECTOR = None


def _maybe_crash(site: str) -> None:
    if _FAULT_INJECTOR is not None:
        _FAULT_INJECTOR(site)


# ---------------------------------------------------------------------------
# Hadoop FS helpers (FS-agnostic: local, HDFS, anything with a Hadoop
# FileSystem implementation)


def _hpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    hp = _hpath(spark, path)
    return hp.getFileSystem(spark._jsc.hadoopConfiguration()), hp


def _write_file_atomic(spark: SparkSession, path: str, data: bytes) -> None:
    """Create-temp + rename so the file is either fully present or
    absent — the marker's atomicity hinges on this."""
    fs, hp = _fs(spark, path)
    tmp = _hpath(spark, f"{path}.tmp{uuid.uuid4().hex[:8]}")
    out = fs.create(tmp, True)
    out.write(bytearray(data))
    out.close()
    if fs.exists(hp):
        fs.delete(hp, False)
    if not fs.rename(tmp, hp):
        raise IOError(f"rename {tmp} -> {hp} failed")


def _read_file(spark: SparkSession, path: str) -> bytes:
    fs, hp = _fs(spark, path)
    stream = fs.open(hp)
    try:
        return bytes(spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _list_names(spark: SparkSession, path: str) -> list[tuple[str, bool]]:
    """(name, is_dir) for the direct children of ``path`` (empty if the
    path does not exist)."""
    fs, hp = _fs(spark, path)
    if not fs.exists(hp):
        return []
    return [
        (st.getPath().getName(), st.isDirectory()) for st in fs.listStatus(hp)
    ]


# ---------------------------------------------------------------------------
# commit protocol


_TRASH_PREFIX = "_skymr_trash_"


def _roll_forward(
    spark: SparkSession, target_path: str, staging_name: str, delete_dirs: list[str]
) -> None:
    """Idempotently complete a commit: promote every partition directory
    still in staging, remove delete-only directories, then clean up the
    staging root. Safe to re-run from any crash point after the marker
    exists, AND tolerant of a CONCURRENT promoter working on the same
    marker (a second writer's auto-recovery racing the first writer's
    own promotion):

    - a staged directory whose ``src`` no longer exists was already
      promoted by the peer — skipped, never treated as an error;
    - the old target directory is never deleted in place: it is
      renamed to an underscore-prefixed TRASH name (invisible to
      readers, atomic), the staged directory renamed in, and the trash
      dropped last. If a racing peer wins the ``src`` rename between
      our existence check and ours failing, the old data sits intact
      in trash (dropped as designed) and the fresh data sits intact at
      ``dest`` — the delete-then-rename ordering this replaces could
      delete a freshly promoted partition and then have nothing left
      to rename (the r9 ADVICE data-loss mode).
    """
    fs, _ = _fs(spark, target_path)
    txid = staging_name[len(_STAGING_PREFIX):]
    staging_path = f"{target_path}/{staging_name}"
    for name, is_dir in _list_names(spark, staging_path):
        if not is_dir:
            continue  # _SUCCESS etc.
        _maybe_crash("mid_promote")
        src = _hpath(spark, f"{staging_path}/{name}")
        dest = _hpath(spark, f"{target_path}/{name}")
        trash = _hpath(spark, f"{target_path}/{_TRASH_PREFIX}{txid}_{name}")
        if not fs.exists(src):
            continue  # peer (or an earlier pass) already promoted it
        if fs.exists(dest):
            # move the old partition aside atomically; a peer may have
            # just promoted-and-cleaned, in which case dest is already
            # the NEW data and our src check below resolves it
            if fs.exists(trash):
                fs.delete(trash, True)  # prior crashed attempt's leftover
            fs.rename(dest, trash)
        _maybe_crash("post_trash")
        try:
            # some FileSystem impls THROW (FileNotFound) instead of
            # returning false when a racing peer moved src first —
            # either way the state re-checks below resolve it
            renamed = bool(fs.rename(src, dest))
        except Exception:
            renamed = False
        if not renamed:
            if not fs.exists(src) and fs.exists(dest):
                pass  # peer promoted between our check and our rename
            elif fs.exists(trash) and not fs.exists(dest):
                # our own rename failed outright: restore the old data
                fs.rename(trash, dest)
                raise IOError(f"promote rename {src} -> {dest} failed; old restored")
            else:
                raise IOError(f"promote rename {src} -> {dest} failed")
        if fs.exists(trash):
            fs.delete(trash, True)
    for name in delete_dirs:
        p = _hpath(spark, f"{target_path}/{name}")
        if fs.exists(p):
            fs.delete(p, True)
    # sweep this commit's trash (crash between a promote's rename and
    # its trash drop leaves one behind) and the staging root
    for name, is_dir in _list_names(spark, target_path):
        if is_dir and name.startswith(f"{_TRASH_PREFIX}{txid}_"):
            fs.delete(_hpath(spark, f"{target_path}/{name}"), True)
    sp = _hpath(spark, staging_path)
    if fs.exists(sp):
        fs.delete(sp, True)


def recover_partitioned(
    spark: SparkSession, target_path: str, *, gc_unmarked: bool = True
) -> str:
    """Heal a crashed :func:`upsert_partitioned` / :func:`delete_partitioned`:
    roll FORWARD any commit whose marker exists (the staged data is
    complete — markers are only written after the staging ``_SUCCESS``),
    and — when ``gc_unmarked`` — roll BACK (delete) orphan staging
    directories with no marker. Returns ``"none"``,
    ``"rolled_forward"`` or ``"rolled_back"``.

    Both entry points auto-run this with ``gc_unmarked=False``: rolling
    a MARKED commit forward is safe against crashes (the marker is the
    point of no return and promotion is idempotent) and against a
    CONCURRENT promoter of the same marker (promotion skips
    already-moved sources and parks the old directory in trash rather
    than deleting in place, so a racing peer can at worst observe the
    commit applied once — see :func:`_roll_forward`). An unmarked
    staging directory, however, is indistinguishable from a concurrent
    writer mid-stage — deleting it out from under that writer would
    turn its commit into partition deletion. Unmarked leftovers are
    invisible to readers (underscore-prefixed), cost only disk, and are
    cleaned by an explicit administrative ``recover_partitioned(...)``
    call made when no writer is active.

    Concurrency contract: writers upserting DISJOINT partition sets
    may run concurrently (each stages privately and promotes only its
    own directories; both commits land — asserted by
    ``test_two_concurrent_writers_disjoint_partitions``). Two writers
    touching the SAME partitions remain last-writer-wins, exactly like
    dynamic partition overwrite — the protocol serializes crash
    atomicity, not isolation."""
    fs, hp = _fs(spark, target_path)
    if not fs.exists(hp):
        return "none"
    names = _list_names(spark, target_path)
    markers = [
        n
        for n, d in names
        if n.startswith(_MARKER_PREFIX) and not d and n.endswith(".json")
    ]
    # an interrupted marker write leaves a `.json.tmp<hex>` file — it was
    # never promoted (the rename IS the publish), so it is pure litter
    for n, d in names:
        if n.startswith(_MARKER_PREFIX) and not d and not n.endswith(".json"):
            fs.delete(_hpath(spark, f"{target_path}/{n}"), False)
    stagings = {n for n, d in names if n.startswith(_STAGING_PREFIX) and d}
    acted = "none"
    referenced: set[str] = set()
    for m in markers:
        meta = json.loads(_read_file(spark, f"{target_path}/{m}").decode())
        referenced.add(meta["staging"])
        _roll_forward(spark, target_path, meta["staging"], meta["delete_dirs"])
        fs.delete(_hpath(spark, f"{target_path}/{m}"), False)
        acted = "rolled_forward"
    if gc_unmarked:
        for s in stagings - referenced:
            fs.delete(_hpath(spark, f"{target_path}/{s}"), True)
            if acted == "none":
                acted = "rolled_back"
        # orphan trash can only exist for a marker that has already been
        # rolled forward (its commit replaced that data) — pure litter
        for n, d in _list_names(spark, target_path):
            if d and n.startswith(_TRASH_PREFIX):
                fs.delete(_hpath(spark, f"{target_path}/{n}"), True)
    return acted


def _commit(
    spark: SparkSession, target_path: str, staging_name: str, delete_dirs: list[str]
) -> None:
    """Publish the marker (atomic), then roll the commit forward and
    remove the marker. From the marker's existence on, the commit is
    durable: any crash is completed by :func:`recover_partitioned`."""
    txid = staging_name[len(_STAGING_PREFIX) :]
    marker_path = f"{target_path}/{_MARKER_PREFIX}{txid}.json"
    _write_file_atomic(
        spark,
        marker_path,
        json.dumps({"staging": staging_name, "delete_dirs": delete_dirs}).encode(),
    )
    _maybe_crash("post_marker")
    _roll_forward(spark, target_path, staging_name, delete_dirs)
    fs, _ = _fs(spark, target_path)
    fs.delete(_hpath(spark, marker_path), False)


def _touched_dir_names(df: DataFrame) -> list[str]:
    """Basenames of the partition directories the (pruned) frame's scan
    actually reads — the writer's own on-disk names, so no value->path
    serialization/escaping is ever reimplemented here."""
    from urllib.parse import unquote

    dirs = (
        df.select(
            F.regexp_replace(F.input_file_name(), "/[^/]*$", "").alias("d")
        )
        .distinct()
        .collect()
    )
    # input_file_name() returns a URI — one unquote recovers the
    # on-disk basename (Hive's own %-escapes are themselves URI-encoded
    # in the URI form, so they survive the decode intact)
    names = {unquote(r["d"].rstrip("/").rsplit("/", 1)[-1]) for r in dirs if r["d"]}
    # only hive-style `col=value` directories are ever promotion/delete
    # targets — a bare file at the table root must never map the root
    # itself into the delete list
    return sorted(n for n in names if "=" in n)


def _partition_filter(partition_col: str, parts: list):
    """``isin`` with correct NULL semantics: a None in ``parts`` must
    match NULL partition rows (plain ``isin`` never matches NULL — that
    would silently drop or orphan the ``__HIVE_DEFAULT_PARTITION__``
    directory's rows)."""
    non_null = [p for p in parts if p is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(p is None for p in parts):
        cond = cond | F.col(partition_col).isNull()
    return cond


# ---------------------------------------------------------------------------
# public entry points


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    *,
    max_touched_partitions: int = 10_000,
    check_key_moves: bool = False,
) -> int:
    """MERGE ``updates`` into the ``partition_col``-partitioned parquet
    table at ``target_path``: rows whose ``key_cols`` match (within the
    touched partitions — see the precondition below) are replaced, new
    keys are inserted, and only partitions present in the updates are
    read or rewritten — via the module's stage-and-promote commit
    protocol, so a crash at any point leaves the table entirely old or
    entirely new (see module docstring and
    :func:`recover_partitioned`). A first upsert into a not-yet-existing
    ``target_path`` creates the table (a plain partitioned write of the
    updates). Returns the number of touched partitions.

    PRECONDITION (the standard partition-aligned-merge caveat, same as
    a static `replaceWhere` in any lakehouse engine): ``partition_col``
    must be stable — functionally determined by ``key_cols``. If an
    update row carries an existing key with a NEW partition value, only
    the new partition is rewritten; the old row survives in its
    untouched partition and the key is duplicated. Pass
    ``check_key_moves=True`` to detect this and fail fast: it joins the
    updates' keys against the full table's (key -> partition) projection
    — one extra scan of the key/partition columns only (column-pruned),
    so it costs a pass over the table's key columns, not its data.

    ``max_touched_partitions`` bounds the driver-side partition list
    (an update batch spraying the whole table should be a rewrite, not
    an upsert — fail fast instead of silently degrading).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    recover_partitioned(spark, target_path, gc_unmarked=False)
    try:
        full = spark.read.parquet(target_path)
    except Exception as exc:  # AnalysisException: PATH_NOT_FOUND
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        # first write: no existing rows to merge against
        n_parts = updates.select(partition_col).distinct().count()
        if n_parts > max_touched_partitions:
            raise ValueError(
                f"updates touch more than max_touched_partitions="
                f"{max_touched_partitions} partitions; use a full rewrite"
            )
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return n_parts
    parts_rows = (
        updates.select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(parts_rows) > max_touched_partitions:
        raise ValueError(
            f"updates touch more than max_touched_partitions="
            f"{max_touched_partitions} partitions; use a full rewrite"
        )
    parts = [r[0] for r in parts_rows]
    if not parts:
        return 0
    if check_key_moves:
        moved = (
            full.select(*keys, F.col(partition_col).alias("__old_part"))
            .join(
                updates.select(*keys, F.col(partition_col).alias("__new_part"))
                .dropDuplicates(keys),
                keys,
            )
            .where(~F.col("__old_part").eqNullSafe(F.col("__new_part")))
            .limit(1)
            .collect()
        )
        if moved:
            r = moved[0]
            raise ValueError(
                f"upsert_partitioned: key {[r[k] for k in keys]} moves from "
                f"partition {r['__old_part']!r} to {r['__new_part']!r}; "
                f"partition_col must be functionally determined by key_cols "
                f"(delete-then-insert across partitions is not expressible as "
                f"a partition-pruned upsert)"
            )
    existing = full.where(_partition_filter(partition_col, parts))
    merged = existing.join(
        updates.select(*keys).dropDuplicates(keys), keys, "left_anti"
    ).unionByName(updates.select(*existing.columns))
    # stage: the plan reads the OLD partition files, which stay in place
    # until promotion, so no lineage-breaking checkpoint is needed
    staging_name = f"{_STAGING_PREFIX}{uuid.uuid4().hex[:12]}"
    merged.write.partitionBy(partition_col).parquet(f"{target_path}/{staging_name}")
    _maybe_crash("post_staging")
    # every touched partition has >=1 update row, so staging covers each
    # one; old dirs with no staged replacement (a writer-escaping
    # mismatch would be the only way) are deleted explicitly. The
    # _SUCCESS gate makes delete_dirs trustworthy: if the staging
    # directory is somehow gone or torn (e.g. an external cleanup raced
    # this writer), abort BEFORE the marker with the table untouched —
    # never conclude "nothing staged, delete everything"
    staging_listing = _list_names(spark, f"{target_path}/{staging_name}")
    if not any(n == "_SUCCESS" for n, d in staging_listing if not d):
        raise IOError(
            f"staging {staging_name} has no _SUCCESS after write — it was "
            f"removed or torn externally; aborting before promote "
            f"(table left unchanged)"
        )
    staged = {n for n, d in staging_listing if d}
    delete_dirs = [d for d in _touched_dir_names(existing) if d not in staged]
    _commit(spark, target_path, staging_name, delete_dirs)
    return len(parts)


def delete_partitioned(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    *,
    max_touched_partitions: int = 10_000,
) -> int:
    """Partition-pruned DELETE from partitioned parquet: remove every
    row whose ``key_cols`` match a row of ``keys``, rewriting ONLY the
    partitions that actually contain matching keys (the right-to-be-
    forgotten / retention-purge primitive), via the stage-and-promote
    commit protocol (crash -> entirely old or entirely new; see module
    docstring). Returns the number of partitions rewritten.

    Unlike :func:`upsert_partitioned`, the touched-partition set is
    not knowable from the deletes alone — it comes from a column-
    pruned scan of the table's (key, partition) projection semi-joined
    against the keys (parquet reads just those columns; the data
    columns are never touched in the discovery pass). Partitions with
    no matches keep their files byte-identical. A partition whose EVERY
    row is deleted has no staged replacement; its directory — the one
    the scan actually read, by name, never a reconstructed
    ``col=value`` string — is removed at promote time (delete-only list
    in the commit marker). An empty key set is a no-op returning 0.
    """
    kc = list(key_cols)
    if not kc:
        raise ValueError("key_cols must be non-empty")
    recover_partitioned(spark, target_path, gc_unmarked=False)
    full = spark.read.parquet(target_path)
    touched_rows = (
        full.select(*kc, partition_col)
        .join(keys.select(*kc).dropDuplicates(kc), kc, "left_semi")
        .select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(touched_rows) > max_touched_partitions:
        raise ValueError(
            f"delete touches more than max_touched_partitions="
            f"{max_touched_partitions} partitions; use a full rewrite"
        )
    parts = [r[0] for r in touched_rows]
    if not parts:
        return 0
    touched = full.where(_partition_filter(partition_col, parts))
    remaining = touched.join(keys.select(*kc).dropDuplicates(kc), kc, "left_anti")
    staging_name = f"{_STAGING_PREFIX}{uuid.uuid4().hex[:12]}"
    remaining.write.partitionBy(partition_col).parquet(f"{target_path}/{staging_name}")
    _maybe_crash("post_staging")
    # fully-emptied partitions are absent from staging: their on-disk
    # directory names come from the files the pruned scan actually read
    old_dirs = _touched_dir_names(touched)
    staging_listing = _list_names(spark, f"{target_path}/{staging_name}")
    if not any(n == "_SUCCESS" for n, d in staging_listing if not d):
        raise IOError(
            f"staging {staging_name} has no _SUCCESS after write — it was "
            f"removed or torn externally; aborting before promote "
            f"(table left unchanged)"
        )
    staged = {n for n, d in staging_listing if d and "=" in n}
    if not staged <= set(old_dirs):
        # a staged directory with no matching on-disk original would be
        # promoted ALONGSIDE the stale one (writer-escaping mismatch) —
        # refuse before the marker, leaving the table untouched
        raise IOError(
            f"delete_partitioned: staged partition directories "
            f"{sorted(staged - set(old_dirs))} have no matching scanned "
            f"directory among {old_dirs}; aborting before promote "
            f"(table left unchanged)"
        )
    delete_dirs = [d for d in old_dirs if d not in staged]
    _commit(spark, target_path, staging_name, delete_dirs)
    return len(parts)
