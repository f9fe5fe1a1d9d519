"""BM25 ranked retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from skylinemapreducehadoop_spark.operators.retrieval import bm25_topk


def _bm25_ref(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Plain-Python reference with the same formula variant."""
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        hits = 0
        for t in sorted(set(terms)):
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            hits += 1
            idf = math.log2(2 * n + 2) - math.log2(2 * dfreq[t] + 1)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            out[i] = (hits, round(s, 6))
    return out


def test_bm25_matches_reference_scores(spark):
    docs = {
        1: "spark shuffle join hash join hash",
        2: "hash table scan filter",
        3: "the quick brown fox",
        4: "join join join spark",
        5: "window agg sort merge",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_topk(df, ["spark", "join", "hash"], k=10).collect()
    }
    want = _bm25_ref(docs, ["spark", "join", "hash"])
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_bm25_ranking_and_k(spark):
    # doc stuffed with the rare term outranks one with a common term
    docs = [(i, "common filler text here") for i in range(1, 9)]
    docs += [(9, "rareword common"), (10, "common common common")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = bm25_topk(df, ["rareword", "common"], k=3).collect()
    assert top[0]["id"] == 9  # rare-term doc wins
    assert len(top) == 3

    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_plan_is_takeordered_not_global_sort(spark):
    df = spark.createDataFrame(
        [(i, "a b c spark") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        bm25_topk(df, ["spark"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_probe_reads_n_buckets_from_stats(spark, tmp_path):
    # an index built with a non-default modulus must probe correctly
    # WITHOUT the caller restating n_buckets — it is read from stats, so
    # a build/probe modulus mismatch (silently-empty buckets) cannot
    # happen
    from skylinemapreducehadoop_spark.operators.retrieval import (
        bm25_probe,
        bm25_topk,
        build_text_index,
    )

    docs = {
        1: "spark shuffle join hash join hash",
        2: "hash table scan filter",
        3: "join merge sort spark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    idx = str(tmp_path / "idx7")
    build_text_index(df, idx, n_buckets=7)
    direct = bm25_topk(df, ["spark", "hash"], k=5).collect()
    probed = bm25_probe(spark, idx, ["spark", "hash"], k=5).collect()
    assert [tuple(r) for r in probed] == [tuple(r) for r in direct]


def test_bm25_probe_equals_direct(spark, tmp_path):
    """probe(index(df)) must equal bm25_topk(df) row-for-row, and the
    posting scan must carry a PartitionFilters bucket prune."""
    from skylinemapreducehadoop_spark.operators.retrieval import (
        bm25_probe,
        bm25_topk,
        build_text_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    terms = ["hash", "merge", "spark", "window"]
    direct = bm25_topk(docs, terms, k=15).collect()
    probed = bm25_probe(spark, idx, terms, k=15)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert [tuple(r) for r in probed.collect()] == [tuple(r) for r in direct]


def test_rrf_fuse_matches_hand_computed(spark):
    from skylinemapreducehadoop_spark.operators.retrieval import rrf_fuse

    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rn long")
    l2 = spark.createDataFrame([(3, 1), (1, 2)], "id long, rn long")
    got = {r["id"]: (r["n_lists"], r["rrf_score"]) for r in rrf_fuse([l1, l2]).collect()}
    assert got[1] == (2, round(sorted([1 / 61, 1 / 62])[0] + sorted([1 / 61, 1 / 62])[1], 6))
    assert got[2] == (1, round(1 / 62, 6))
    assert got[3] == (2, round(1 / 63 + 1 / 61, 6))
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_retrieval_ndcg_matches_python_reference(spark):
    import math

    from skylinemapreducehadoop_spark.operators.retrieval import (
        bm25_topk,
        retrieval_ndcg,
    )

    texts = [
        "alpha beta gamma delta",
        "alpha alpha beta beta gamma",
        "alpha beta",
        "delta epsilon zeta",
        "unrelated words only here",
        "alpha gamma delta beta alpha",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    terms = ["alpha", "beta", "gamma"]
    row = retrieval_ndcg(df, terms, k=4).collect()[0]

    # python reference: rel = distinct matched terms per doc
    rel = {
        i: len(set(t.split()) & set(terms))
        for i, t in enumerate(texts)
        if set(t.split()) & set(terms)
    }
    top = bm25_topk(df, terms, k=4).collect()
    dcg = sum(
        round(
            (2.0 ** r["n_terms_hit"] - 1.0) / math.log2(pos + 2), 6
        )
        for pos, r in enumerate(top)
    )
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    idcg = sum(
        round((2.0 ** g - 1.0) / math.log2(pos + 2), 6)
        for pos, (_, g) in enumerate(ideal)
    )
    assert row["k"] == 4 and row["n_ranked"] == len(top)
    assert row["dcg"] == round(dcg, 6)
    assert row["idcg"] == round(idcg, 6)
    assert row["ndcg"] == round(dcg / idcg, 6)
    # a ranking evaluated against its own ideal grade ordering is <= 1
    assert 0.0 < row["ndcg"] <= 1.0


def test_retrieval_ndcg_perfect_when_coverage_orders(spark):
    from skylinemapreducehadoop_spark.operators.retrieval import retrieval_ndcg

    # every doc same length, distinct coverage grades -> BM25 order ==
    # coverage order -> nDCG exactly 1
    texts = [
        "alpha beta gamma pad1",
        "alpha beta pad1 pad2",
        "alpha pad1 pad2 pad3",
        "pad1 pad2 pad3 pad4",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    row = retrieval_ndcg(df, ["alpha", "beta", "gamma"], k=3).collect()[0]
    assert row["ndcg"] == 1.0
