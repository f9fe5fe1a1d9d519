"""Canary-entry laws (r13 — functions/canary.py).

Every canary must be STRICT-green locally — not just `==`-green:
normalized cell TYPES must match between the Spark result and the
DuckDB oracle, because the driver's value-hash comparator serializes
cells before hashing (the r11/r12 driver-red root cause was an
int64-vs-float64 seam that Python `==` tolerates — see
tools/dtype_audit.py and the canary module docstring).

The one deliberate exception is ``canary_sum_raw``: its oracle keeps
the raw HUGEINT ``sum()`` so duckdb materializes float64 — the
differential half of the dtype probe. The non-vacuity control here
asserts that the seam is REAL locally (oracle float vs spark int);
if a duckdb upgrade ever starts returning int64 for HUGEINT sums,
the control fails and the canary pair must be re-derived.
"""

from __future__ import annotations

import duckdb
import pytest

from skylinemapreducehadoop_spark.functions.canary import CANARIES
from skylinemapreducehadoop_spark.functions.text import pin_ws_oracle


def _connect(sf_dir: str):
    from skylinemapreducehadoop_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df):
    import sys

    sys.path.insert(0, ".")
    from tools.check_contract import _norm_df

    return _norm_df(df)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = _connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n in CANARIES if n != "canary_sum_raw"])
def test_canary_strict_green(spark, sf_dir, con, name):
    fn, sql = CANARIES[name]
    spdf = fn(spark, sf_dir).toPandas()
    opdf = con.execute(pin_ws_oracle(sql)).fetchdf()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    a, b = _norm(spdf), _norm(opdf)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            assert type(x) is type(y), (name, ra, rb)
            # repr equality, not ==: a serializing value-hash
            # distinguishes -0.0 vs 0.0 and 1 vs True; == does not
            assert repr(x) == repr(y), (name, ra, rb)


def test_canary_sum_raw_differential(spark, sf_dir, con):
    """The deliberately-uncast half: values equal, TYPES diverge
    locally (duckdb HUGEINT sum -> float64). `==`-green, hash-red —
    exactly the channel the driver pair discriminates."""
    fn, sql = CANARIES["canary_sum_raw"]
    spdf = fn(spark, sf_dir).toPandas()
    opdf = con.execute(pin_ws_oracle(sql)).fetchdf()
    a, b = _norm(spdf), _norm(opdf)
    assert a == b, "values must agree (the probe isolates dtype only)"
    # non-vacuity: the dtype seam is real on this duckdb
    s_total = dict(zip(sorted(spdf.columns), a[0]))["total"]
    o_total = dict(zip(sorted(opdf.columns), b[0]))["total"]
    assert type(s_total) is int
    assert type(o_total) is float, (
        "duckdb now materializes HUGEINT sums as int — the "
        "canary_sum_raw/canary_sum_cast differential is vacuous; re-derive"
    )


def test_canary_oracles_pass_ws_lint():
    for name, (_, sql) in CANARIES.items():
        pin_ws_oracle(sql)  # raises on any bare \s


def test_registry_window_r15_invariants():
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as E

    qs = list(E.queries().keys())
    assert qs[:50] == E._R15_WINDOW
    assert len(set(E._R15_WINDOW)) == 50
    oracles = E.oracle_sql()
    # task 5 (r12 verdict): no rows-only entry may hold a window slot
    assert all(q in oracles for q in qs[:50])
    # r15 rotation (COVERAGE.md arithmetic): rule-1 and new-rule-2
    # counts are both 0 post-r14, so rule 3 governs all 50 slots —
    # the 31 staleness-6 tier leads, then the 19 family-rep backfill
    assert qs[0] == "above_avg_orders"
    assert "skyline_blocked" in qs[:31] and "q5_local_supplier" in qs[:31]
    assert "golden_records_customers" in qs[31:50]
    # r13 verdict task 2: the job-done expected-red diagnostic stays
    # retired from the window (it remains in the registry, below)
    assert "canary_sum_raw" not in qs[:50]
    assert "canary_sum_raw" in qs
    # all canaries are below-window permanent infrastructure as of
    # r15 (the two data canaries seated+attested green at r14;
    # re-enter only under rule 2)
    assert not any(
        q.startswith("canary_") for q in qs[:50]
    ), [q for q in qs[:50] if q.startswith("canary_")]


def test_sf01_timeout_second_scale_coverage():
    """Every declared sf0.1 expected-timeout entry must be value-checked
    whole at a second scale (VERDICT r14 task 3 + task 6): either at
    full sf0.1 via the sliced protocols (output-sliced SLICED or
    input-sliced SLICED_INPUT) or at sf0.03 via the whole-value
    fallback corpus. The three sets are declared constants so this
    invariant can't silently rot when an entry moves between them."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as E
    from tools.check_contract import EXPECTED_SF01_TIMEOUTS
    from tools.check_scale_sliced import SLICED, SLICED_INPUT
    from tools.make_sf003 import FALLBACK_ENTRIES

    oracles = E.oracle_sql()
    # declared sets only name real oracled registry entries
    for name in (set(EXPECTED_SF01_TIMEOUTS) | set(SLICED)
                 | set(SLICED_INPUT) | set(FALLBACK_ENTRIES)):
        assert name in oracles, f"{name} not an oracled registry entry"
    covered = set(SLICED) | set(SLICED_INPUT) | set(FALLBACK_ENTRIES)
    uncovered = set(EXPECTED_SF01_TIMEOUTS) - covered
    assert not uncovered, (
        f"expected-timeout entries with no second-scale value check: "
        f"{sorted(uncovered)}"
    )
    # an entry checked at full sf0.1 via a sliced protocol should not
    # ALSO burn sf0.03 fallback time (the r14 task-6 wall-time goal)
    double = (set(SLICED) | set(SLICED_INPUT)) & set(FALLBACK_ENTRIES)
    assert not double, f"redundant sf0.03 fallback entries: {sorted(double)}"
