"""Bounded per-session registry of persisted intermediate frames.

Several operators materialize a small intermediate that their plan
consumes more than once (a local-skyline union, a distinct edge set, a
degree table). ``persist_tracked`` persists it and tracks the handle in
a bounded FIFO so a long-lived session running many queries does not
accumulate cached frames forever.

Eviction semantics: unpersisting beyond the cap only costs a SILENT
RECOMPUTE if an evicted frame (or a returned plan built on it) is
re-executed later — results stay correct. The lock makes register/evict
safe under concurrent query construction.

Nothing here caches *across* invocations: every query invocation builds
and persists its own frames from the source tables.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_PERSISTED_CAP = 8
_PERSISTED_LOCK = threading.Lock()


def persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    with _PERSISTED_LOCK:
        _PERSISTED.append(df)
        evicted = []
        while len(_PERSISTED) > _PERSISTED_CAP:
            evicted.append(_PERSISTED.pop(0))
    for old in evicted:
        try:
            old.unpersist(blocking=False)
        except Exception:  # noqa: BLE001
            pass
    return df
