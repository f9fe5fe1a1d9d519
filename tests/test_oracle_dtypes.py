"""Oracle OUTPUT-DTYPE regression tests (r13).

Root cause of the r11/r12 driver reds (tools/dtype_audit.py): duckdb
materializes HUGEINT — the return type of ``sum(BIGINT)`` — as
float64 through fetchdf, while the Spark twin returns int64. The
local `==` comparator tolerates 600 == 600.0; the driver's
value-hash does not. The four affected oracles now CAST their final
integer sums to BIGINT; these tests pin that, duckdb-only (no Spark
session), so the regression is cheap to catch.

The full cross-engine audit (every oracle entry, both engines) is
tools/dtype_audit.py — run per round per the COVERAGE.md checklist;
it reported 0 mismatches over the whole registry at the r13 code.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest


@pytest.fixture(scope="module")
def con(sf_dir):
    from skylinemapreducehadoop_spark.sources.tables import TABLES

    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield c
    c.close()


def _oracle(name: str) -> str:
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as E

    return E.oracle_sql()[name]


# entry -> the integer-valued output columns whose HUGEINT sums the
# r13 fix casts to BIGINT (plus every other int column, pinned while
# we are here)
_INT_COLS = {
    "vocab_growth_documents": ["k", "cutoff_id", "n_docs", "n_tokens", "n_vocab"],
    "byte_token_budget_documents": ["n_docs", "n_chars", "n_bytes", "n_tokens"],
    "script_mix_documents": ["n_chars"],
    "strip_boilerplate_documents": ["n_segments", "n_flagged"],
}


@pytest.mark.parametrize("name", sorted(_INT_COLS))
def test_oracle_integer_outputs_are_int64(con, name):
    pdf = con.execute(_oracle(name)).fetchdf()
    for col in _INT_COLS[name]:
        assert col in pdf.columns, (name, col)
        assert np.issubdtype(pdf[col].dtype, np.integer), (
            f"{name}.{col} materializes as {pdf[col].dtype} — the "
            "HUGEINT->float64 value-hash seam is back (cast the sum "
            "to BIGINT in the oracle; see tools/dtype_audit.py)"
        )


def test_hugeint_seam_is_real(con):
    """Non-vacuity control: raw sum(BIGINT) still comes back float64
    on this duckdb; if an upgrade changes that, the casts above are
    redundant (harmless) and the canary differential pair must be
    re-derived."""
    pdf = con.execute("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)").fetchdf()
    assert pdf["s"].dtype == np.float64


def test_decimal_canary_oracle_emits_sql_double(con):
    """ADVICE r13: the C15 oracle's s_total_dbl literal must be DOUBLE
    at the SQL type level, not a bare DECIMAL(4,2) literal that is
    only float64 because duckdb 1.0's fetchdf materializes DECIMAL
    that way. typeof() pins the SQL type, independent of fetchdf."""
    from skylinemapreducehadoop_spark.functions.canary import _DEC_ORACLE

    t = con.execute(
        "SELECT typeof(s_total_dbl) AS a, typeof(o_total_dbl) AS b, "
        "typeof(s_total_cents) AS c, typeof(o_total_cents) AS d "
        f"FROM ({_DEC_ORACLE})"
    ).fetchone()
    assert t == ("DOUBLE", "DOUBLE", "BIGINT", "BIGINT"), t


def test_datetime_canary_oracle_integer_widths(con):
    """The C14 oracle's integer outputs must be BIGINT so their
    fetchdf dtype (int64) matches the Spark side's .cast('long') —
    the driver hash is type-sensitive (the r11/r12 lesson); never
    seat a canary with a known width seam."""
    from skylinemapreducehadoop_spark.functions.canary import _DT_ORACLE

    t = con.execute(
        "SELECT typeof(s_epoch_us) AS a, typeof(o_epoch_us) AS b, "
        "typeof(s_weekday) AS c, typeof(o_weekday) AS d "
        f"FROM ({_DT_ORACLE})"
    ).fetchone()
    assert t == ("BIGINT", "BIGINT", "BIGINT", "BIGINT"), t
