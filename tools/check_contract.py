"""Local driver-mimic: run every __spark_entry__ query against its
DuckDB oracle at a given sf and report row-count / schema / value
matches. Usage:
    python tools/check_contract.py [--json out.json]
        [--oracle-timeout SEC] [sf_dir] [query ...]

--oracle-timeout interrupts a DuckDB oracle after SEC seconds and
records 'oracle timeout' for that entry (some oracles are deliberately
naive all-pairs specs that are intractable beyond sf0.01).

--expect-timeouts-sf01 activates the PRE-DECLARED expected-timeout set
(EXPECTED_SF01_TIMEOUTS below — VERDICT r14 task 3): a timeout inside
the set is recorded as expected (not a failure); a timeout OUTSIDE the
set is an unexplained slowdown and fails the run; a declared entry
that completes is a bonus 'recovered' and is value-checked normally.
The artifact records all three lists so round-over-round deltas are
explicit rather than inferred from err-string greps.

With --json, a machine-readable artifact is written mapping each
checked entry to {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err, sec} (rows-only entries report rows_match/spark_rows
with schema_match/hash_match null), so below-window verification is a
committed artifact rather than prose (LOCALCHECK_r{N}.json).
"""

from __future__ import annotations

import json
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from skylinemapreducehadoop_spark.session import get_session
from skylinemapreducehadoop_spark.sources.tables import TABLES

# Pre-declared expected-timeout set for FULL sf0.1 artifact runs at
# --oracle-timeout 300 (VERDICT r14 task 3). The 9 structural members
# are deliberately naive all-pairs / cluster-closure oracles (their
# value is being obviously-correct specs; at sf0.1 they are
# intractable by design). containment_pairs_documents is the declared
# BORDERLINE member: 284.9s/300 at r13, over at r14's ~15-20% slower
# sandbox — drift, not slowdown. Every member has its values checked
# whole at a second scale elsewhere (sliced full-sf0.1 in
# SCALECHECK_SLICED or whole-value sf0.03 in LOCALCHECK_SF003).
EXPECTED_SF01_TIMEOUTS = {
    "containment_pairs_documents",   # borderline (drift-sensitive)
    "dedup_clusters_documents",
    "dedup_minhash_documents",
    "dedup_star_clusters",
    "dedup_sweep_documents",
    "leakage_safe_split_documents",
    "negative_pairs_documents",
    "ngram_jaccard_documents",
    "setsim_join_documents",
    "streaming_near_dup_replay",
}


def _norm_cell(v):
    if v is None:
        return None
    if not isinstance(v, (list, tuple, np.ndarray, dict)) and pd.isna(v):
        return None
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


def _norm_df(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def _connect(sf_dir: str):
    """Fresh DuckDB connection with all table views registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _fetch_with_timeout(con, sql: str, timeout_sec: float | None):
    """Run the oracle in a worker thread; interrupt DuckDB on timeout.

    Some oracles are deliberately naive (all-pairs NOT EXISTS / self
    joins — that is their value as specs), so at larger scale factors
    they can be intractable. A timeout records 'oracle timeout'
    honestly instead of hanging a multi-entry artifact run forever.

    Returns (df, err, poisoned): after a timeout the connection has an
    interrupted (possibly still-running) worker on it, so the caller
    must DISCARD it and reconnect rather than reuse it for the next
    entry (ADVICE r11) — `poisoned=True` signals that, and the err
    string records whether the worker actually exited.
    """
    if not timeout_sec:
        return con.execute(sql).fetchdf(), None, False
    import threading

    box: dict = {}

    def run():
        try:
            box["df"] = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        err = f"oracle timeout after {timeout_sec}s"
        if t.is_alive():
            err += " (worker still running after interrupt+30s)"
        return None, err, True
    if "err" in box:
        raise box["err"]
    return box["df"], None, False


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    oracle_timeout = None
    expected_timeouts: set[str] = set()
    usage = (
        "usage: check_contract.py [--json OUT.json] "
        "[--oracle-timeout SEC] [--expect-timeouts-sf01] "
        "[sf_dir] [query ...]"
    )
    while argv and argv[0].startswith("--"):
        if argv[0] == "--expect-timeouts-sf01":  # valueless flag
            expected_timeouts = set(EXPECTED_SF01_TIMEOUTS)
            argv = argv[1:]
            continue
        if argv[0] not in ("--json", "--oracle-timeout"):
            raise SystemExit(f"unknown flag {argv[0]}\n{usage}")
        if len(argv) < 2:  # flag without its value (ADVICE r11)
            raise SystemExit(f"{argv[0]} requires a value\n{usage}")
        if argv[0] == "--json":
            json_out = argv[1]
            argv = argv[2:]
        elif argv[0] == "--oracle-timeout":
            try:
                oracle_timeout = float(argv[1])
            except ValueError:
                raise SystemExit(
                    f"--oracle-timeout expects seconds, got {argv[1]!r}\n{usage}"
                ) from None
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}\n{usage}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    con = _connect(sf_dir)

    spark = get_session()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None, "sec": None,
        }
        results[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            rec["err"] = f"spark error: {type(e).__name__}: {e}"
            rec["sec"] = round(time.time() - t0, 2)
            print(f"FAIL  {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["spark_rows"] = len(spdf)
        if name not in oracles:
            rec["rows_match"] = True  # rows-only contract: ran, produced a frame
            rec["sec"] = round(time.time() - t0, 2)
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{rec['sec']}s]")
            continue
        try:
            opdf, terr, poisoned = _fetch_with_timeout(
                con, oracles[name], oracle_timeout
            )
            if poisoned:
                # the interrupted connection may still have a live
                # worker on it — never reuse it for the next entry
                # (ADVICE r11); reconnect with fresh views instead
                try:
                    con.close()
                except Exception:  # noqa: BLE001
                    pass
                con = _connect(sf_dir)
            if terr is not None:
                rec["err"] = terr
                rec["sec"] = round(time.time() - t0, 2)
                if name in expected_timeouts:
                    rec["expected_timeout"] = True
                    print(f"TIMEOUT(expected) {name}: {terr}")
                else:
                    print(f"TIMEOUT {name}: {terr}")
                    n_fail += 1
                continue
        except Exception as e:
            rec["err"] = f"oracle error: {type(e).__name__}: {e}"
            rec["sec"] = round(time.time() - t0, 2)
            print(f"FAIL  {name}: {rec['err']}")
            n_fail += 1
            continue
        rec["oracle_rows"] = len(opdf)
        rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
        rec["rows_match"] = len(spdf) == len(opdf)

        problems = []
        if not rec["schema_match"]:
            problems.append(f"columns spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}")
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if not problems:
            a, b = _norm_df(spdf), _norm_df(opdf)
            rec["hash_match"] = a == b
            if not rec["hash_match"]:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        else:
            rec["hash_match"] = False
        rec["sec"] = round(time.time() - t0, 2)
        if problems:
            rec["err"] = "; ".join(str(p) for p in problems)[:500]
            print(f"FAIL  {name}: {rec['err']} [{rec['sec']}s]")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(spdf)} rows [{rec['sec']}s]")
            n_pass += 1

    timed_out = {
        n for n, r in results.items()
        if r.get("err") and "oracle timeout" in str(r["err"])
    }
    expected_hit = sorted(timed_out & expected_timeouts)
    unexpected = sorted(timed_out - expected_timeouts)
    recovered = sorted(
        (expected_timeouts & set(results)) - timed_out
    ) if expected_timeouts else []
    if expected_timeouts:
        print(
            f"\n{n_pass} ok, {n_fail} fail, "
            f"{len(expected_hit)} expected timeouts"
            + (f", {len(unexpected)} UNEXPECTED timeouts: {unexpected}"
               if unexpected else "")
            + (f", {len(recovered)} recovered (declared but completed): "
               f"{recovered}" if recovered else "")
        )
    else:
        print(f"\n{n_pass} ok, {n_fail} fail")
    if json_out:
        # env stamping must never cost us the artifact after a long run
        # (ADVICE r13): any import/JVM failure degrades to env=None,
        # mirroring bench.py's guard.
        try:
            from tools.envinfo import env_fingerprint

            env = env_fingerprint(spark)
        except Exception as exc:  # pragma: no cover - env-dependent
            print(f"WARN  env fingerprint failed: {exc}")
            env = None
        with open(json_out, "w") as fh:
            payload = {"sf_dir": sf_dir, "n_pass": n_pass,
                       "n_fail": n_fail, "env": env, "results": results}
            if expected_timeouts:
                payload["expected_timeout_set"] = sorted(expected_timeouts)
                payload["expected_timeouts_hit"] = expected_hit
                payload["unexpected_timeouts"] = unexpected
                payload["recovered_timeouts"] = recovered
            json.dump(payload, fh, indent=1, default=str)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
