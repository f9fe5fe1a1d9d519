"""Focused A/B measurement harness for optimization work (r17).

Runs a named subset of queries (bench discipline: session warmup,
prime + median-of-3 per query, noop sink) in ONE fresh process with
optional extra session conf, and prints a JSON line. This is a
builder-side tool only — bench.py stays the driver's authoritative
harness.

Usage:
    python tools/measure.py q1 q2 ...              # named queries
    python tools/measure.py --headline             # the 21 headline queries
    --conf k=v (repeatable)   extra session conf for the A/B arm
    --sf DIR                  data dir (default $SPARK_GRAFT_SF_DIR)
    --runs N                  timed runs per query (default 3, median)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from skylinemapreducehadoop_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-calibration", action="store_true")
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    names = list(args.names)
    if args.headline:
        names = benchmod.BENCH_QUERIES + [n for n in names if n not in benchmod.BENCH_QUERIES]

    spark = get_session("measure-r17", extra_conf=extra)
    qs = entrymod.queries()
    qs["skyline_gsod_volume"] = benchmod._skyline_gsod_volume
    qs["bpe_train_documents"] = benchmod._bpe_train_documents
    qs["bpe_encode_documents"] = benchmod._bpe_encode_documents
    qs["kcore_copurchase"] = benchmod._kcore_copurchase

    warm = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    warm.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: (pdf for pdf in it), warm.schema
    ).count()

    calibration = None if args.no_calibration else benchmod._run_calibration(spark)

    def once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            spark.sparkContext.setJobDescription(f"measure:{name}")
            once(name)  # prime
            runs = sorted(once(name) for _ in range(args.runs))
            out[name] = round(runs[len(runs) // 2], 3)
            spread[name] = [round(r, 3) for r in runs]
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        finally:
            spark.sparkContext.setJobDescription(None)
    rec = {
        "queries": out,
        "spread": spread,
        "total": round(sum(out.values()), 3),
        "calibration_sec": calibration,
        "conf": extra,
        "sf": args.sf,
    }
    if errors:
        rec["errors"] = errors
    print(json.dumps(rec))
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass


if __name__ == "__main__":
    main()
