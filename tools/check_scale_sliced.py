"""Scale-sliced oracle check for the PAIR-LOCAL quadratic-oracle
entries (r10 verdict task 2, the honest path past oracle timeouts).

The all-pairs DuckDB oracles for the set-similarity family are
deliberately naive specs; at sf0.1 (60k docs -> 1.8B candidate pairs
each needing a list_intersect) they are intractable, so
LOCALCHECK_SF01 records 'oracle timeout' for them. But their measures
are PAIR-LOCAL — Jaccard, containment and cosine of a pair (a, b)
depend on a and b alone — so slicing COMMUTES with the join:

    {pairs from the FULL corpus, restricted to ids in slice S}
  = {pairs from the corpus restricted to S}

This tool therefore runs the Spark side at FULL sf0.1 (proving the
at-scale execution path: prefix filters, bucket joins, shuffle plans),
restricts the OUTPUT to pairs with both ids in a deterministic residue
slice, and compares against the entry's EXISTING oracle SQL run over a
DuckDB view of the sliced table — the oracle text is reused verbatim;
only the view definition changes, so the spec stays independent.

Slice: id % MOD == RES (default 10/7, ~6k docs at sf0.1 — exactly the
pair work the sf0.01 full oracle already does in seconds). MOD must
divide 100000 (asserted) so embedding_near_dup's planted +100000
duplicate ids stay in their source's residue class — planting and
slicing commute too.

Usage:
    python tools/check_scale_sliced.py [--json out.json]
        [--mod M --res R | --all-res] [sf_dir]

--all-res sweeps EVERY residue class 0..M-1 against the one full-scale
Spark result (the expensive side runs once; each sliced oracle is an
sf0.01-sized job), so the union of checks covers every same-residue
pair — ~1/M of the full pair set instead of ~1/M^2.

r14 adds a second protocol, SLICED_INPUT, for CLUSTER-GLOBAL
quadratic oracles (output carries no ids, e.g. dedup_sweep's
threshold curve): both engines run over the SAME residue-sliced
corpus per residue — see the dict's comment.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from check_contract import _norm_df  # same normalization as the driver mimic
from skylinemapreducehadoop_spark.session import get_session
from skylinemapreducehadoop_spark.sources.tables import TABLES

# entry -> (sliced table, id column of that table, output id columns)
# Only SCALE-PATH operators belong here (prefix-filter join, inverted
# index, LSH buckets): the point is to exercise the at-scale Spark
# execution. ngram_jaccard_documents joins as of r14 (the r13 verdict's
# task 7): it IS the documented brute-force all-pairs twin
# (dedup.py:ngram_jaccard_pairs) so its full-sf0.1 Spark side is slow
# (~12 min at r13, but it completes and runs ONCE for all residues) —
# the verdict wants its full-scale VALUE check in this artifact rather
# than the sf0.03 fallback.
SLICED = {
    "setsim_join_documents": ("documents", "doc_id", ["id_a", "id_b"]),
    "containment_pairs_documents": ("documents", "doc_id", ["id_a", "id_b"]),
    "embedding_near_dup": ("embeddings", "vec_id", ["id_a", "id_b"]),
    "ngram_jaccard_documents": ("documents", "doc_id", ["id_a", "id_b"]),
}

# entry -> (sliced table, id column). CLUSTER-GLOBAL oracles whose
# output carries no id columns (e.g. a threshold -> pair/doc-count
# curve), so slicing the OUTPUT cannot work. Instead BOTH engines run
# over the SAME residue-sliced corpus: the Spark side reads a sliced
# parquet copy (written by Spark itself, so types round-trip), the
# oracle reads the original parquet through a residue-filtered view.
# Each residue is an independent full-pipeline value check on real
# sf0.1 corpus content (~1/MOD of the docs, sf0.01-sized pair work);
# the union over all residues covers every same-residue pair. Weaker
# than output-slicing (the Spark plan runs at 1/MOD scale), but a
# genuine cross-engine check on sf0.1 content where the naive oracle
# at full scale is intractable.
SLICED_INPUT = {
    "dedup_sweep_documents": ("documents", "doc_id"),
    # r15 (VERDICT r14 task 6): the two slowest sf0.03-fallback
    # entries move here. Their recursive-CTE cluster closures do not
    # commute with OUTPUT slicing (components span residues), but the
    # SLICED_INPUT protocol never needs that: both engines cluster
    # the SAME residue-sliced corpus, so each residue is an exact
    # cross-engine check of the full pipeline (shingle -> candidate
    # -> closure -> split) on real sf0.1 content at sf0.01-sized
    # pair work. Union over residues checks every same-residue pair.
    "dedup_clusters_documents": ("documents", "doc_id"),
    "leakage_safe_split_documents": ("documents", "doc_id"),
}


def _check_res(con_args, full, out_ids, oracle_sql, mod, res):
    """Compare the residue-res slice of the full Spark result against
    the oracle over the sliced view. Returns a result record."""
    sf_dir, table, id_col = con_args
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows_sliced": None, "oracle_rows": None, "err": None,
    }
    try:
        mask = (full[out_ids[0]] % mod == res)
        for c in out_ids[1:]:
            mask &= (full[c] % mod == res)
        spdf = full[mask].reset_index(drop=True)
        rec["spark_rows_sliced"] = len(spdf)

        con = duckdb.connect()
        try:
            for t in TABLES:
                pred = f" WHERE {id_col} % {mod} = {res}" if t == table else ""
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet'){pred}"
                )
            opdf = con.execute(oracle_sql).fetchdf()
        finally:
            con.close()
        rec["oracle_rows"] = len(opdf)
        rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
        rec["rows_match"] = len(spdf) == len(opdf)
        if rec["schema_match"] and rec["rows_match"]:
            rec["hash_match"] = _norm_df(spdf) == _norm_df(opdf)
        else:
            rec["hash_match"] = False
    except Exception as e:  # noqa: BLE001
        rec["err"] = f"{type(e).__name__}: {e}"[:400]
    return rec


def _check_res_input(spark, qfn, oracle_sql, sf_dir, table, id_col,
                     mod, res, tmp_root):
    """Run BOTH engines over the residue-res sliced corpus and compare
    the whole outputs (the SLICED_INPUT protocol for cluster-global
    oracles). Returns a result record."""
    import shutil

    from skylinemapreducehadoop_spark.sources.tables import load_table

    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    tmp = os.path.join(tmp_root, f"{table}_m{mod}_r{res}")
    try:
        os.makedirs(tmp, exist_ok=True)
        # Spark writes the sliced table itself so parquet types
        # round-trip exactly; every other table is symlinked.
        sliced = load_table(spark, sf_dir, table).where(
            f"{id_col} % {mod} = {res}"
        )
        sliced.write.mode("overwrite").parquet(
            os.path.join(tmp, f"{table}.parquet")
        )
        for t in TABLES:
            # abspath: a relative sf_dir would otherwise make the
            # symlink target resolve relative to tmp and dangle
            src = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
            dst = os.path.join(tmp, f"{t}.parquet")
            if t != table and os.path.exists(src) and not os.path.lexists(dst):
                os.symlink(src, dst)

        spdf = qfn(spark, tmp).toPandas()
        rec["spark_rows"] = len(spdf)

        con = duckdb.connect()
        try:
            for t in TABLES:
                pred = f" WHERE {id_col} % {mod} = {res}" if t == table else ""
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet'){pred}"
                )
            opdf = con.execute(oracle_sql).fetchdf()
        finally:
            con.close()
        rec["oracle_rows"] = len(opdf)
        rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
        rec["rows_match"] = len(spdf) == len(opdf)
        if rec["schema_match"] and rec["rows_match"]:
            rec["hash_match"] = _norm_df(spdf) == _norm_df(opdf)
        else:
            rec["hash_match"] = False
    except Exception as e:  # noqa: BLE001
        rec["err"] = f"{type(e).__name__}: {e}"[:400]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return rec


def main() -> int:
    argv = sys.argv[1:]
    json_out, mod, res, all_res = None, 10, 7, False
    while argv and argv[0].startswith("--"):
        if argv[0] == "--json":
            json_out = argv[1]; argv = argv[2:]
        elif argv[0] == "--mod":
            mod = int(argv[1]); argv = argv[2:]
        elif argv[0] == "--res":
            res = int(argv[1]); argv = argv[2:]
        elif argv[0] == "--all-res":
            all_res = True; argv = argv[1:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    assert 100000 % mod == 0, (
        "MOD must divide 100000 so embedding_near_dup's planted "
        "+100000 ids stay in their source's residue class"
    )

    spark = get_session()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    residues = list(range(mod)) if all_res else [res]

    for name, (table, id_col, out_ids) in SLICED.items():
        t0 = time.time()
        rec = {
            "mod": mod, "residues": residues, "sliced_table": table,
            "spark_rows_full": None, "sliced_total": 0,
            "per_res": {}, "hash_match": None, "err": None, "sec": None,
        }
        results[name] = rec
        try:
            # Spark: ONE full-scale run; every residue slices the same
            # in-memory result, so the expensive side is never repeated
            full = qs[name](spark, sf_dir).toPandas()
            rec["spark_rows_full"] = len(full)
            for r in residues:
                sub = _check_res(
                    (sf_dir, table, id_col), full, out_ids,
                    oracles[name], mod, r,
                )
                rec["per_res"][r] = sub
                rec["sliced_total"] += sub["spark_rows_sliced"] or 0
            rec["hash_match"] = all(
                s["hash_match"] is True for s in rec["per_res"].values()
            )
            first_bad = next(
                (f"res={r}: {s['err'] or 'mismatch'}"
                 for r, s in rec["per_res"].items()
                 if s["hash_match"] is not True),
                None,
            )
            if first_bad:
                rec["err"] = first_bad
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
            rec["hash_match"] = False
        rec["sec"] = round(time.time() - t0, 2)
        ok = rec["hash_match"] is True
        n_pass += ok
        n_fail += not ok
        print(
            f"{'OK  ' if ok else 'FAIL'}  {name}: full={rec['spark_rows_full']} "
            f"sliced_total={rec['sliced_total']} over {len(residues)} residues "
            f"[{rec['sec']}s]" + (f" err={rec['err']}" if rec["err"] else "")
        )

    import shutil
    import tempfile

    tmp_root = tempfile.mkdtemp(prefix="sliced_input_")
    try:
        for name, (table, id_col) in SLICED_INPUT.items():
            t0 = time.time()
            rec = {
                "mod": mod, "residues": residues, "sliced_table": table,
                "protocol": "sliced_input", "per_res": {},
                "hash_match": None, "err": None, "sec": None,
            }
            results[name] = rec
            try:
                for r in residues:
                    rec["per_res"][r] = _check_res_input(
                        spark, qs[name], oracles[name], sf_dir,
                        table, id_col, mod, r, tmp_root,
                    )
                rec["hash_match"] = all(
                    s["hash_match"] is True for s in rec["per_res"].values()
                )
                first_bad = next(
                    (f"res={r}: {s['err'] or 'mismatch'}"
                     for r, s in rec["per_res"].items()
                     if s["hash_match"] is not True),
                    None,
                )
                if first_bad:
                    rec["err"] = first_bad
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"{type(e).__name__}: {e}"[:400]
                rec["hash_match"] = False
            rec["sec"] = round(time.time() - t0, 2)
            ok = rec["hash_match"] is True
            n_pass += ok
            n_fail += not ok
            print(
                f"{'OK  ' if ok else 'FAIL'}  {name} [sliced-input]: "
                f"{len(residues)} residues [{rec['sec']}s]"
                + (f" err={rec['err']}" if rec["err"] else "")
            )
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    print(f"\n{n_pass} ok, {n_fail} fail")
    if json_out:
        json.dump(
            {"sf_dir": sf_dir, "mod": mod, "residues": residues,
             "all_res": all_res,
             "n_pass": n_pass, "n_fail": n_fail, "results": results},
            open(json_out, "w"), indent=1, default=str,
        )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
