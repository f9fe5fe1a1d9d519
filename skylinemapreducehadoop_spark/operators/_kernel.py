"""Vectorized in-memory skyline (Pareto-set) kernel.

Semantics match the reference engine's GSKY loop
(``/root/reference/Skyline.java:44-70`` and ``Point.dominates``,
``/root/reference/Point.java:62-70``): p dominates q iff p <= q on every
dimension and p < q on at least one — all dimensions min-normalized.
Strict dominance means exact duplicates never dominate each other, so
every copy of a non-dominated duplicate survives.

The reference uses an O(n² · d) scalar nested loop. Here: sort-filter-
skyline (SFS) with chunked numpy broadcasting. Sorting ascending by the
dimension sum (a monotone score) guarantees a dominator sorts strictly
before anything it dominates, so by transitivity a point is dominated
iff it is dominated by an *already-found skyline point*. Each chunk is
therefore (a) filtered against the accumulated skyline window with one
broadcast comparison, then (b) resolved intra-chunk with one pairwise
broadcast — no per-row Python loop anywhere.
"""

from __future__ import annotations

import numpy as np

# Chunk sizes bound the broadcast temporaries: a (CHUNK, WINDOW_CHUNK, d)
# bool array at d=9 is ~75 MB — safely inside an executor-thread budget.
_CHUNK = 2048
_WINDOW_CHUNK = 4096


def skyline_mask(values: np.ndarray, chunk: int = _CHUNK) -> np.ndarray:
    """Boolean mask of Pareto-optimal rows of a (n, d) min-normalized array.

    ``values`` must be float with no NaNs — callers drop null rows first
    (engine semantics: skyline is defined over non-null dimension values;
    the reference corrupts on its missing-value sentinels — SURVEY.md
    §1.2 — we filter instead).
    """
    values = np.asarray(values, dtype=np.float64)
    if values.ndim != 2:
        raise ValueError(f"expected (n, d) array, got shape {values.shape}")
    n = values.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)

    order = np.argsort(values.sum(axis=1), kind="stable")
    sv = values[order]

    keep_sorted = np.zeros(n, dtype=bool)
    window = np.empty_like(sv)  # accumulated skyline points, sum-ordered
    w = 0

    for start in range(0, n, chunk):
        c = sv[start : start + chunk]
        alive = np.ones(len(c), dtype=bool)

        # (a) filter against the accumulated skyline window
        ws = 0
        while ws < w and alive.any():
            win = window[ws : min(ws + _WINDOW_CHUNK, w)]
            cand = c[alive]
            le = (win[None, :, :] <= cand[:, None, :]).all(axis=2)
            lt = (win[None, :, :] < cand[:, None, :]).any(axis=2)
            alive[np.flatnonzero(alive)[(le & lt).any(axis=1)]] = False
            ws += _WINDOW_CHUNK

        # (b) intra-chunk pairwise dominance among survivors
        a = c[alive]
        if len(a):
            le = (a[:, None, :] <= a[None, :, :]).all(axis=2)
            lt = (a[:, None, :] < a[None, :, :]).any(axis=2)
            dominated = (le & lt).any(axis=0)
            idx = np.flatnonzero(alive)[dominated]
            alive[idx] = False

        survivors = c[alive]
        keep_sorted[start : start + len(c)] = alive
        window[w : w + len(survivors)] = survivors
        w += len(survivors)

    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def dominates(p: np.ndarray, q: np.ndarray) -> bool:
    """Strict Pareto dominance on min-normalized vectors (Point.java:62-70)."""
    return bool(np.all(p <= q) and np.any(p < q))
