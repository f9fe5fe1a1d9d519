"""Machine-readable physical-plan audit of every registry entry.

For each ``__spark_entry__.queries()`` entry (at sf0.01), records a
plan fingerprint the verdict can diff across rounds without re-reading
plans by hand:

- ``exchanges``: number of Exchange (shuffle) operators
- ``global_windows``: Window operators with an EMPTY partition spec
  (the "Moving all data to a single partition" scale-killer; prefix-sum
  internals keyed by __pid are NOT counted)
- ``cartesian`` / ``bnlj``: scale-killer join nodes (the pytest gate
  enforces these; the snapshot makes the count visible per entry)
- ``codegen_spans``: WholeStageCodegen regions (bigger spans = more of
  the plan stays JVM-compiled)
- ``pushed_scans`` / ``scans``: parquet scans carrying PushedFilters
  vs. all parquet scans (filter pushdown reached the reader)
- ``python_eval``: ArrowEvalPython / BatchEvalPython / MapInPandas /
  ArrowEvalPythonUDTF nodes (the Python boundary count)

Eager entries (driver-side collects during plan construction) still
produce a final DataFrame; the fingerprint covers that final plan.

Usage: python tools/plan_snapshot.py [--json PLANSNAP.json] [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from skylinemapreducehadoop_spark.session import get_session


def fingerprint(plan: str) -> dict:
    # Once any part of an AQE plan has executed (e.g. an operator's
    # internal sampling job), toString() appends the pre-execution
    # tree after an "== Initial Plan ==" marker — counting both halves
    # doubles every metric for that entry depending on session state.
    # Fingerprint only the CURRENT plan so counts are state-stable.
    plan = plan.split("== Initial Plan ==")[0]
    global_windows = 0
    for ln in plan.splitlines():
        if "windowspecdefinition" not in ln or "__pid" in ln:
            continue
        # a KEYED spec prints windowspecdefinition(key#1, ord#2 ASC ...);
        # a GLOBAL one starts directly with the order column, so its
        # FIRST argument carries the sort direction
        for m in re.finditer(r"windowspecdefinition\(([^)]*)", ln):
            first = m.group(1).split(",")[0]
            if "ASC" in first or "DESC" in first:
                global_windows += 1
                break
    scans = len(re.findall(r"Scan parquet|FileScan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    return {
        "exchanges": plan.count("Exchange"),
        "global_windows": global_windows,
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scans": scans,
        "pushed_scans": pushed,
        "python_eval": sum(
            plan.count(t)
            for t in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                      "FlatMapGroupsInPandas", "MapInArrow")
        ),
    }


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] if len(args) > 1 else None

    spark = get_session()
    qs = entrymod.queries()
    result = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            fp = fingerprint(plan)
            fp["sec"] = round(time.time() - t0, 2)
            result[name] = fp
            flag = ""
            if fp["cartesian"]:
                flag = " CARTESIAN"
            print(f"{name}: ex={fp['exchanges']} gw={fp['global_windows']} "
                  f"py={fp['python_eval']} scans={fp['pushed_scans']}/{fp['scans']}{flag}")
        except Exception as e:  # noqa: BLE001 - audit must not abort
            result[name] = {"err": str(e)[:200]}
            print(f"{name}: ERR {str(e)[:120]}")
    spark.stop()
    if out_path:
        summary = {
            "sf_dir": sf_dir,
            "n_entries": len(result),
            "n_err": sum(1 for v in result.values() if "err" in v),
            "total_cartesian": sum(v.get("cartesian", 0) for v in result.values()),
            "plans": result,
        }
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
