"""Cross-engine OUTPUT DTYPE audit (r13 divergence forensics).

The local comparator (`check_contract._norm_df`) compares cells with
Python `==`, which is int/float tolerant (600 == 600.0) — but a
VALUE-HASH comparator (the driver's) serializes cells before hashing,
so an int64 Spark column vs a float64 oracle column (DuckDB returns
HUGEINT `sum(BIGINT)` as float64 through fetchdf) hashes differently
even when every value is numerically identical. This tool runs every
requested entry on BOTH engines and reports, per column, the pandas
dtype pair and whether the NORMALIZED PYTHON TYPES of the first rows
differ — the exact class of silent divergence a value-hash sees and
`==` does not.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]

Exit code: 1 on any UNEXPECTED cell-type mismatch (gates the
per-round checklist — ADVICE r13), 0 otherwise. ``canary_sum_raw``
is the one EXPECTED mismatch: it is the deliberately-uncast half of
the dtype differential pair (functions/canary.py) whose entire job
is to exhibit exactly the seam this audit detects; it is reported
with an EXPECT prefix and does not affect the exit code. If an
EXPECTED_MISMATCH entry comes back with NO mismatch (e.g. a duckdb
upgrade closes the HUGEINT seam) the audit prints WARN and exits 1
— a vanished seam hollows out the probe and must be re-root-caused
(ADVICE r14).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from skylinemapreducehadoop_spark.session import get_session  # noqa: E402
from tools.check_contract import _connect, _norm_cell  # noqa: E402

# entries whose dtype mismatch is the documented PURPOSE of the entry
EXPECTED_MISMATCH = {"canary_sum_raw"}


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    con = _connect(sf_dir)
    spark = get_session()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_mismatch = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        if sorted(spdf.columns) != sorted(opdf.columns):
            print(f"SCHEMA {name}: {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            continue
        bad = []
        for c in spdf.columns:
            sv = next((x for x in (_norm_cell(v) for v in spdf[c]) if x is not None), None)
            ov = next((x for x in (_norm_cell(v) for v in opdf[c]) if x is not None), None)
            if sv is None or ov is None:
                continue
            if type(sv) is not type(ov):
                bad.append(
                    f"{c}: spark {spdf[c].dtype}/{type(sv).__name__}"
                    f" vs oracle {opdf[c].dtype}/{type(ov).__name__}"
                )
        # NaN-vs-NULL census (r13): _norm_cell maps BOTH float NaN and
        # SQL NULL to None, so a cell that is NaN on one engine and
        # NULL on the other is ==-green locally but may hash-red under
        # a comparator that serializes NaN distinctly. Flag any column
        # whose NaN count differs between engines (true NULLs arrive
        # as None/NaN uniformly per column; a count mismatch means the
        # two engines disagree on WHICH missing kind they emit).
        if not bad and len(spdf) == len(opdf):
            import math

            def _nan_count(col):
                n = 0
                for v in col:
                    if isinstance(v, float) and math.isnan(v):
                        n += 1
                return n

            for c in spdf.columns:
                ns, no = _nan_count(spdf[c]), _nan_count(opdf[c])
                none_s = sum(1 for v in spdf[c] if v is None)
                none_o = sum(1 for v in opdf[c] if v is None)
                if (ns + none_s) == (no + none_o) and ns != no:
                    bad.append(
                        f"{c}: NaN/NULL kind mismatch (spark {ns} NaN/"
                        f"{none_s} None vs oracle {no} NaN/{none_o} None)"
                    )
        # repr-level pass (r13): a serializing value-hash distinguishes
        # cells Python == cannot — -0.0 vs 0.0, 1 vs True, one-ulp
        # float differences that round-trip to different reprs. Compare
        # the SORTED normalized rows cell-by-cell by repr; only
        # meaningful when both frames have the same row count.
        if not bad and len(spdf) == len(opdf):
            from tools.check_contract import _norm_df

            a, b = _norm_df(spdf), _norm_df(opdf)
            for ra, rb in zip(a, b):
                for x, y in zip(ra, rb):
                    if repr(x) != repr(y):
                        bad.append(f"repr: {x!r} vs {y!r}")
                        break
                if bad:
                    break
        if bad and name in EXPECTED_MISMATCH:
            print(f"EXPECT {name}: " + "; ".join(bad))
        elif bad:
            n_mismatch += 1
            print(f"TYPE  {name}: " + "; ".join(bad))
        elif name in EXPECTED_MISMATCH:
            # The differential probe's whole job is to exhibit the
            # seam; it vanishing silently (e.g. a duckdb upgrade
            # closing the HUGEINT path) would hollow out the probe —
            # surface it loudly and gate on it (ADVICE r14).
            n_mismatch += 1
            print(
                f"WARN  {name}: EXPECTED_MISMATCH entry reported NO "
                "mismatch — the dtype seam this probe exists to "
                "exhibit has vanished; re-root-cause before trusting "
                "the audit (see tests/test_oracle_dtypes.py)"
            )
        else:
            print(f"ok    {name}")
    print(f"\n{n_mismatch} entries with unexpected cell-type mismatches")
    spark.stop()
    return 1 if n_mismatch else 0


if __name__ == "__main__":
    raise SystemExit(main())
