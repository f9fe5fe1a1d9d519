"""Physical-plan shape assertions for the round-5 queries.

These guard the scale-critical plan properties: no cartesian products,
dimension joins broadcast (not sort-merge at test scale), and the
narrow operators staying shuffle-free. A regression here is invisible
to correctness checks but fatal at 100 TB.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_tpch_queries_no_cartesian_no_smj(spark):
    import __spark_entry__ as em

    qs = em.queries()
    for name in [
        "q8_market_share",
        "q9_profit_by_nation",
        "q13_customer_distribution",
        "q15_top_supplier",
    ]:
        plan = _plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_chunk_documents_is_shuffle_free(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["chunk_documents"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_uses_broadcast_semi_join(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["decontaminate_documents"](spark, SF))
    assert "CartesianProduct" not in plan
    # one-pass contamination_check (r16): the benchmark gram set is
    # BROADCAST into a left join whose hit marker feeds a conditional
    # count — the corpus side still never shuffles its grams (the only
    # exchange keys on the doc id for the final fold)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "LeftSemi" not in plan  # the stitch join is gone


def test_window_analytics_events_single_shuffle(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["window_analytics_events"](spark, SF))
    # one hash partitioning by user_id feeds every window function
    assert plan.count("Exchange hashpartitioning") == 1
