"""Pin the pre-declared sf0.1 expected-timeout set (r14 verdict task 3).

``check_contract.py --expect-timeouts-sf01`` turns an oracle timeout
into a FAILURE unless the entry is pre-declared in
``EXPECTED_SF01_TIMEOUTS``. The gate is only as honest as that set:
a typo'd name never matches (so the real entry's timeout fails runs
forever), and silently widening the set is exactly the "11th
timeout" drift the r14 verdict warned about. These tests pin the
membership to the 10 documented names and check every member is a
real, oracled registry entry — no Spark session needed, so the pin
is cheap to run.

The at-scale VALUE coverage for these entries lives elsewhere by
design (sliced full-sf0.1 in SCALECHECK_SLICED_r{N}.json, whole-value
sf0.03 in LOCALCHECK_SF003_r{N}.json); COVERAGE.md records the
per-round artifact split.
"""

from __future__ import annotations


# The 9 structural members (deliberately naive all-pairs /
# cluster-closure oracle specs, intractable at sf0.1 by design) plus
# the declared BORDERLINE member containment_pairs_documents
# (284.9s/300 at r13, timed out at r14's slower sandbox, RECOVERED
# green in 249.7s at r15 — it stays declared because it is
# drift-sensitive, not because it is structurally intractable).
DOCUMENTED_SET = {
    "containment_pairs_documents",
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


def test_expected_timeout_set_membership_is_pinned():
    from tools.check_contract import EXPECTED_SF01_TIMEOUTS

    assert set(EXPECTED_SF01_TIMEOUTS) == DOCUMENTED_SET, (
        "EXPECTED_SF01_TIMEOUTS changed; widening the set can hide a "
        "real slowdown (r14 verdict task 3) — update this pin only "
        "with a COVERAGE.md note recording why the entry joined/left"
    )


def test_expected_timeout_entries_are_oracled_registry_entries():
    # A typo'd member never matches a timeout, so the gate silently
    # loses a declared entry; every name must be a live queries() key
    # WITH an oracle (rows-only entries cannot time out on the oracle
    # side at all).
    import __spark_entry__ as entrymod
    from tools.check_contract import EXPECTED_SF01_TIMEOUTS

    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    missing_q = sorted(set(EXPECTED_SF01_TIMEOUTS) - qs)
    missing_o = sorted(set(EXPECTED_SF01_TIMEOUTS) & qs - oracles)
    assert not missing_q, f"not registry entries: {missing_q}"
    assert not missing_o, f"declared but rows-only (no oracle): {missing_o}"
