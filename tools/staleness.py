"""Machine-readable staleness dashboard for the correctness-window
rotation (VERDICT r10 task 7).

Emits STALENESS_r{N}.json mapping every registry entry to:

    {
      "window_position":  1-based position in queries() (driver checks 1-50),
      "last_driver_round": newest round whose CORRECTNESS_r*.json has an
                           all-green row for the entry (null = never),
      "last_driver_green": whether that newest driver row was green,
      "last_local_round":  newest round whose LOCALCHECK*_r*.json has a
                           green row (hash-green, or rows-green for the
                           declared rows-only entries),
      "modules":           package modules the entry's callable imports
                           (derived from its source, not hand-maintained),
      "touched_since":     true if any of those module files has a commit
                           AFTER the "round {last_driver_round}: ..."
                           marker commit (i.e. the code moved since the
                           entry's last driver row),
      "staleness_rounds":  current_round - last_driver_round (null if never
                           driver-checked)
    }

so a judge can audit the rotation bound with one jq, e.g.:

    jq '[.entries[] | select(.last_driver_round == null)] | length'
    jq '[.entries[] | select(.touched_since and .window_position > 50)]'

Usage:
    python tools/staleness.py [--round N] [--out STALENESS_rN.json]

The current round defaults to (newest "round N:" marker commit) + 1 —
i.e. the round currently being built.
"""

from __future__ import annotations

import glob
import inspect
import json
import re
import subprocess
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


def _round_markers() -> dict[int, str]:
    """Map round number -> commit sha of its 'round N: ...' marker."""
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout
    markers: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            rnd = int(m.group(1))
            # newest marker per round wins (log is newest-first, keep first)
            markers.setdefault(rnd, sha)
    return markers


def _entry_modules(fn) -> list[str]:
    """Package modules an entry callable imports, from its source."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return []
    mods = set()
    for m in re.finditer(
        r"from (skylinemapreducehadoop_spark(?:\.\w+)*) import", src
    ):
        mods.add(m.group(1).replace(".", "/") + ".py")
    return sorted(mods)


def _touched_after(path: str, sha: str) -> bool:
    """Any commit to `path` after marker commit `sha`?"""
    out = subprocess.run(
        ["git", "log", "--oneline", f"{sha}..HEAD", "--", path],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    return bool(out)


def main() -> int:
    argv = sys.argv[1:]
    cur_round = None
    out_path = None
    while argv:
        if argv[0] == "--round":
            cur_round = int(argv[1]); argv = argv[2:]
        elif argv[0] == "--out":
            out_path = argv[1]; argv = argv[2:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")

    markers = _round_markers()
    if cur_round is None:
        cur_round = max(markers) + 1 if markers else 1
    if out_path is None:
        out_path = f"STALENESS_r{cur_round}.json"

    # ---- driver rows ----
    driver: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for name, rec in json.load(open(f)).items():
            # declared rows-only entries (no oracle by design) record
            # err='no_oracle' with a row count: that IS their green
            # (the weaker rows-only contract COVERAGE.md documents),
            # not a failure — r6/r7 rows for kmeans/pagerank/ann/approx
            # otherwise read as permanently red here.
            rows_only_green = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
            )
            green = rows_only_green or bool(
                rec.get("rows_match")
                and rec.get("schema_match", True) is not False
                and rec.get("hash_match", True) is not False
            )
            prev = driver.get(name)
            if prev is None or rnd >= prev[0]:
                driver[name] = (rnd, green)

    # ---- local rows (LOCALCHECK_r*.json and LOCALCHECK_SF01_r*.json) ----
    local: dict[str, int] = {}
    for f in sorted(glob.glob("LOCALCHECK*_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", f).group(1))
        data = json.load(open(f))
        # check_contract --json wraps per-entry rows under "results"
        data = data.get("results", data)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = bool(rec.get("rows_match")) and rec.get("err") is None \
                and rec.get("hash_match") is not False \
                and rec.get("schema_match") is not False
            if green and rnd >= local.get(name, -1):
                local[name] = rnd

    qs = entrymod.queries()
    entries: dict[str, dict] = {}
    mod_touch_cache: dict[tuple[str, str], bool] = {}
    for pos, (name, fn) in enumerate(qs.items(), start=1):
        drow = driver.get(name)
        mods = _entry_modules(fn)
        # touched_since stays null (unknown) when we cannot attribute the
        # entry to package modules (e.g. closures from the _sky factory,
        # or pure-DataFrame entries living wholly in __spark_entry__.py)
        touched = None
        if drow is not None and mods:
            sha = markers.get(drow[0])
            if sha:
                touched = False
                for mod in mods:
                    key = (mod, sha)
                    if key not in mod_touch_cache:
                        mod_touch_cache[key] = _touched_after(mod, sha)
                    if mod_touch_cache[key]:
                        touched = True
                        break
        entries[name] = {
            "window_position": pos,
            "last_driver_round": drow[0] if drow else None,
            "last_driver_green": drow[1] if drow else None,
            "last_local_round": local.get(name),
            "modules": mods,
            "touched_since": touched,
            "staleness_rounds": (cur_round - drow[0]) if drow else None,
        }

    never = [n for n, e in entries.items() if e["last_driver_round"] is None]
    # Make the artifact's temporal position explicit (VERDICT r14 task
    # 1): a dashboard generated BEFORE round N's driver run cannot see
    # round N's rows — stamp which correctness artifacts were ingested
    # so a reader never mistakes pre-run staleness for post-run.
    ingested = sorted(glob.glob("CORRECTNESS_r*.json"))
    summary = {
        "round": cur_round,
        "generated": (
            "pre-run" if not glob.glob(f"CORRECTNESS_r{cur_round:02d}.json")
            else "post-run"
        ),
        "correctness_artifacts_ingested": ingested,
        "registry_size": len(entries),
        "never_driver_checked": len(never),
        "in_window_never_checked": sum(
            1 for n in never if entries[n]["window_position"] <= 50
        ),
        "max_staleness_once_green": max(
            (e["staleness_rounds"] for e in entries.values()
             if e["staleness_rounds"] is not None),
            default=None,
        ),
    }
    json.dump(
        {"summary": summary, "entries": entries},
        open(out_path, "w"), indent=1,
    )
    print(json.dumps(summary, indent=2))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
