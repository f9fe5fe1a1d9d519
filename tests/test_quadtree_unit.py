"""Driver-side quadtree unit tests (FIXTURES.md F4) — pure numpy."""

from __future__ import annotations

import numpy as np

from skylinemapreducehadoop_spark.operators._kernel import skyline_mask
from skylinemapreducehadoop_spark.operators.quadtree import (
    _LEAF,
    assign_cells,
    build_tree,
    cell_bounds,
    prune_tree,
)


def _grid(seed=0, n=200, d=2):
    rng = np.random.RandomState(seed)
    return rng.rand(n, d)


def test_small_sample_is_single_leaf():
    pts = _grid(n=5)
    tree = build_tree(pts, np.zeros(2), np.ones(2), maxp=20)
    assert tree == _LEAF


def test_every_point_gets_exactly_one_cell():
    pts = _grid(n=500)
    tree = build_tree(pts, np.zeros(2), np.ones(2), maxp=20)
    cells = assign_cells(pts, tree)
    assert all(c is not None for c in cells)  # nothing pruned before prune_tree
    # determinism
    cells2 = assign_cells(pts, tree)
    assert (cells == cells2).all()


def test_cell_bounds_roundtrip():
    pts = _grid(n=800, d=3)
    lo, hi = np.zeros(3), np.ones(3)
    tree = build_tree(pts, lo, hi, maxp=30)
    cells = assign_cells(pts, tree)
    for cid in set(cells):
        clo, chi = cell_bounds(cid, lo, hi)
        inside = pts[cells == cid]
        # routing ties go low: lo <= x <= hi always holds
        assert (inside >= clo[None, :] - 1e-12).all()
        assert (inside <= chi[None, :] + 1e-12).all()


def test_pruned_cells_contain_no_skyline_point():
    rng = np.random.RandomState(42)
    pts = rng.rand(2000, 2)
    lo, hi = np.zeros(2), np.ones(2)
    tree = build_tree(pts, lo, hi, maxp=50)
    sky = pts[skyline_mask(pts)]
    n_pruned = prune_tree(tree, lo, hi, sky)
    assert n_pruned > 0  # uniform data: upper cells must die
    cells = assign_cells(pts, tree)
    sky_mask = skyline_mask(pts)
    # no true skyline point may land in a pruned (None) cell
    assert all(c is not None for c in cells[sky_mask])


def test_prune_is_safe_for_all_points():
    """A pruned point must be dominated by some sample-skyline point."""
    rng = np.random.RandomState(1)
    pts = rng.rand(1000, 3)
    lo, hi = np.zeros(3), np.ones(3)
    tree = build_tree(pts, lo, hi, maxp=40)
    sky = pts[skyline_mask(pts)]
    prune_tree(tree, lo, hi, sky)
    cells = assign_cells(pts, tree)
    pruned_pts = pts[np.array([c is None for c in cells])]
    for p in pruned_pts:
        le = (sky <= p[None, :]).all(axis=1)
        lt = (sky < p[None, :]).any(axis=1)
        assert (le & lt).any(), f"pruned point {p} is not dominated"
