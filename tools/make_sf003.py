"""Derive the intermediate-scale sf0.03 check corpus (r11 verdict
task 3).

Several cluster-global naive oracles are intractable for DuckDB at
sf0.1 (recursive-CTE closures / all-pairs Jaccard over 5k docs) and
cluster closure does not commute with id-residue OUTPUT slicing, so
the original sliced-view protocol cannot reach them. This tool
derives a deterministic intermediate corpus where the SAME oracles
run whole.

As of r15 the sf0.03 fallback set is FOUR entries —
dedup_minhash_documents, negative_pairs_documents,
streaming_near_dup_replay, dedup_star_clusters — the rest graduated
to full-sf0.1 checks in SCALECHECK_SLICED (VERDICT r14 task 6):
dedup_sweep/ngram_jaccard/setsim/containment/embedding_near_dup via
output- or input-slicing at r13/r14, and the two slowest fallbacks
(dedup_clusters_documents 295s, leakage_safe_split_documents 275s)
via the SLICED_INPUT protocol at r15 — input-slicing needs no
commuting, both engines cluster the same residue-sliced sf0.1
corpus. Corpus derivation:

- documents/embeddings: the ``id % 10 < 3`` residue subset of sf0.1
  (1,500 docs — 23 of the 225 planted near-dup pairs survive with
  both endpoints, so the cluster structure stays non-trivial; both
  engines read the identical subset, so the check is exact);
- the other eight tables: symlinks to the sf0.1 originals (the seven
  entries read only documents; the links just satisfy the
  check_contract view registration).

Deterministic (no RNG, no timestamps): re-running reproduces the
corpus bit-for-bit, so LOCALCHECK_SF003_r12.json is reproducible from
this tool + /root/testdata alone. Usage:

    python tools/make_sf003.py [out_dir]   # default .localdata/sf0.03
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# The declared sf0.03 whole-value fallback set as of r15 (the entries
# whose second-scale value check runs here rather than in
# SCALECHECK_SLICED). Kept as a constant so the coverage invariant —
# every EXPECTED_SF01_TIMEOUTS member is value-checked at a second
# scale by SLICED ∪ SLICED_INPUT ∪ FALLBACK_ENTRIES — is testable
# (tests/test_canary.py::test_sf01_timeout_second_scale_coverage).
FALLBACK_ENTRIES = [
    "dedup_minhash_documents",
    "negative_pairs_documents",
    "streaming_near_dup_replay",
    "dedup_star_clusters",
]

LINKED_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".localdata", "sf0.03"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/documents.parquet') "
        "WHERE doc_id % 10 < 3 ORDER BY doc_id) TO "
        f"'{out}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/embeddings.parquet') "
        "WHERE vec_id % 10 < 3 ORDER BY vec_id) TO "
        f"'{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in LINKED_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {out}: {n} documents")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
