"""Dedup operator tests with planted duplicates/near-duplicates."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.operators import dedup as D


def _make_docs(spark):
    """30 base docs + exact dups + near dups (1-2 word edits)."""
    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    base_texts = {}
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(40)]
        base_texts[i] = " ".join(words)
        rows.append((i, base_texts[i]))
    # exact dups of docs 0 and 1
    rows.append((100, base_texts[0]))
    rows.append((101, base_texts[1]))
    rows.append((102, base_texts[1]))
    # near dups of docs 2 and 3 (edit 2 words out of 40)
    for nid, src in ((200, 2), (201, 3)):
        words = base_texts[src].split()
        words[5] = "edited"
        words[17] = "tweaked"
        rows.append((nid, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    docs = _make_docs(spark)
    out = D.exact_dedup(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep[0] == 2  # doc 0 + 100
    assert by_keep[1] == 3  # doc 1 + 101 + 102
    assert sum(r["n_copies"] for r in out) == docs.count()


def test_shingles_short_and_empty_docs(spark):
    """Regression: docs with < k tokens must yield an EMPTY shingle set,
    not a descending sequence(1,0) that crashes slice() at runtime."""
    from pyspark.sql import functions as F

    rows = [(0, ""), (1, "one"), (2, "one two"), (3, "one two three"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", D.shingles("text", 3).alias("sh")).collect()
    }
    assert out[0] == [] and out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]
    assert out[4] == []
    # and the full near-dup pipeline survives a corpus containing them
    assert D.minhash_near_dup(df, threshold=0.5).count() == 0


def test_minhash_finds_planted_near_dups(spark):
    docs = _make_docs(spark)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.minhash_near_dup(docs, threshold=0.5).collect()}
    # exact dups have jaccard 1.0
    assert pairs[(0, 100)] == 1.0
    assert pairs[(1, 101)] == 1.0
    # planted near-dups found
    assert (2, 200) in pairs and pairs[(2, 200)] > 0.5
    assert (3, 201) in pairs and pairs[(3, 201)] > 0.5


def test_minhash_matches_bruteforce_jaccard(spark):
    docs = _make_docs(spark)
    lsh = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in D.minhash_near_dup(docs, threshold=0.4).collect()}
    brute = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in D.ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert lsh == brute  # recall 1.0 at these band settings, same scores


def test_simhash_deterministic_and_near(spark):
    docs = _make_docs(spark)
    sh = {r["id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[0] == sh[100]  # identical text -> identical simhash
    assert sh[1] == sh[101] == sh[102]
    # near-dup pair should be within small hamming distance
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sh[2], sh[200]) <= 10
    # unrelated docs differ a lot
    assert ham(sh[4], sh[5]) > 10


def test_simhash_near_dup_pairs(spark):
    docs = _make_docs(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_near_dup(docs, max_hamming=3).collect()}
    assert (0, 100) in pairs
    assert (1, 101) in pairs and (1, 102) in pairs and (101, 102) in pairs


def test_minhash_plan_has_no_cartesian(spark):
    docs = _make_docs(spark)
    plan = D.minhash_near_dup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_clusters_transitive(spark):
    # chain 1-2-3 plus island 10-11: transitivity must merge the chain
    # into ONE cluster labeled by its min id
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_long_chain_converges(spark):
    # a path graph is the diameter worst case for hash-min propagation
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(pairs).collect()}
    assert set(out) == set(range(n + 1))
    assert set(out.values()) == {0}


def test_star_clusters_match_hashmin(spark):
    # star and hash-min must produce IDENTICAL labels on mixed shapes:
    # a chain, a clique, an island pair, and a singleton self-loop edge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (20, 21), (20, 22), (21, 22), (30, 31), (40, 40)],
        "id_a long, id_b long",
    )
    hm = {r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(pairs).collect()}
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(pairs, algorithm="star").collect()
    }
    assert st == hm
    assert st[4] == 1 and st[22] == 20 and st[31] == 30 and st[40] == 40


def test_star_clusters_chain_1000_logarithmic_rounds(spark):
    """A 1000-deep path graph: hash-min would need ~1000 rounds (its
    default cap is 20 — it CANNOT finish); large-star/small-star must
    converge to one cluster in O(log n) alternations."""
    import math

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(pairs, algorithm="star", max_iters=30).collect()
    }
    assert set(out) == set(range(n + 1))
    assert set(out.values()) == {0}
    # each alternation at least squares away path length -> O(log n)
    bound = 2 * math.ceil(math.log2(n)) + 4
    assert D._LAST_STAR_ROUNDS <= bound, D._LAST_STAR_ROUNDS


def test_star_clusters_rejects_unknown_algorithm(spark):
    import pytest

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError):
        D.dedup_clusters(pairs, algorithm="nope")


def test_contamination_check_counts(spark):
    from skylinemapreducehadoop_spark.operators.dedup import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (2, "quick brown fox jumps over a sleepy cat today"),  # partial
            (3, "completely unrelated text with many different words"),
            (4, "tiny doc"),  # < k tokens -> 0 grams
            (5, None),  # NULL text -> 0 grams (not size(NULL) = -1)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(corpus, bench, k=5).collect()}
    assert out[1]["n_grams"] == 5 and out[1]["n_shared"] == 5
    assert out[1]["contamination"] == 1.0
    # doc 2 shares exactly 'quick brown fox jumps over'
    assert out[2]["n_shared"] == 1
    assert out[3]["n_shared"] == 0 and out[3]["contamination"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["contamination"] == 0.0
    assert out[5]["n_grams"] == 0 and out[5]["n_shared"] == 0
    assert out[5]["contamination"] == 0.0


def test_setsim_matches_bruteforce_jaccard(spark):
    """Prefix filtering is EXACT: setsim_join must equal the all-pairs
    twin on pairs AND scores, at multiple thresholds."""
    docs = _make_docs(spark)
    for t in (0.3, 0.5, 0.8):
        pf = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in D.setsim_join(docs, threshold=t).collect()
        }
        brute = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in D.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert pf == brute, f"threshold {t}"


def test_setsim_short_and_null_docs(spark):
    rows = [(0, ""), (1, "one"), (2, None), (3, "a b c d"), (4, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in D.setsim_join(df, threshold=0.5).collect()}
    assert pairs == {(3, 4)}


def test_setsim_plan_has_no_cartesian(spark):
    docs = _make_docs(spark)
    plan = D.setsim_join(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_segment_dedup_keeps_first_occurrence(spark):
    # doc 0 and doc 1 share an identical 10-token segment; doc 1 must
    # lose it, doc 0 (smaller id) keeps it; unique segments survive
    seg = " ".join(f"w{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(10))
    rows = [
        (0, seg + " " + uniq),
        (1, seg),                       # fully duplicated -> empty
        (2, uniq.replace("u", "v")),    # unique -> unchanged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.segment_dedup(df, width=10).collect()}
    assert out[0]["clean_text"] == seg + " " + uniq and out[0]["n_kept"] == 2
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[1]["n_segments"] == 1
    assert out[2]["clean_text"] == rows[2][1] and out[2]["n_kept"] == 1


def test_segment_dedup_within_doc_repeat(spark):
    # the SAME segment repeated inside one doc is also deduped (only
    # the first position survives)
    seg = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame([(7, seg + " " + seg)], "doc_id long, text string")
    row = D.segment_dedup(df, width=10).collect()[0]
    assert row["clean_text"] == seg
    assert row["n_segments"] == 2 and row["n_kept"] == 1


def test_segment_dedup_partial_tail_segment(spark):
    # 13 tokens -> segments of 10 + 3; counts and rebuild preserve order
    text = " ".join(f"t{i}" for i in range(13))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = D.segment_dedup(df, width=10).collect()[0]
    assert row["clean_text"] == text
    assert row["n_segments"] == 2 and row["n_kept"] == 2


def test_segment_dedup_empty_doc_contract_both_modes(spark):
    """Empty/NULL/whitespace-only documents survive in the output as
    (id, '', 0, 0) in BOTH modes — cdc used to drop them entirely and
    aligned used to emit a phantom '' segment (latent divergence found
    in the r7 audit)."""
    df = spark.createDataFrame(
        [(1, "x y z"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    for mode in ("aligned", "cdc"):
        out = {r["doc_id"]: r for r in D.segment_dedup(df, width=2, mode=mode).collect()}
        assert set(out) == {1, 2, 3, 4}, mode
        for i in (2, 3, 4):
            r = out[i]
            assert (r["clean_text"], r["n_segments"], r["n_kept"]) == ("", 0, 0), mode
        assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2


def test_segment_dedup_cdc_catches_shifted_boilerplate(spark):
    """A boilerplate run shifted by +1 token escapes the aligned mode
    (segments are position-aligned) but is caught by content-defined
    chunking (boundaries depend only on token content)."""
    rng = __import__("random").Random(7)
    boiler = " ".join(f"b{rng.randrange(10**6)}" for _ in range(80))
    pre_a = " ".join(f"a{rng.randrange(10**6)}" for _ in range(17))
    pre_b = " ".join(f"c{rng.randrange(10**6)}" for _ in range(18))  # +1 offset
    df = spark.createDataFrame(
        [(1, f"{pre_a} {boiler}"), (2, f"{pre_b} {boiler}")],
        "doc_id long, text string",
    )
    import skylinemapreducehadoop_spark.operators.dedup as D

    aligned = {r["doc_id"]: r for r in D.segment_dedup(df, width=10).collect()}
    # aligned mode provably misses: doc 2's segments all survive
    assert aligned[2]["n_kept"] == aligned[2]["n_segments"]

    cdc = {r["doc_id"]: r for r in D.segment_dedup(df, width=10, mode="cdc").collect()}
    # CDC catches the run's interior: doc 2 loses segments
    assert cdc[2]["n_kept"] < cdc[2]["n_segments"]
    # only boilerplate tokens are dropped; doc 2's own prefix survives
    assert all(t in cdc[2]["clean_text"].split() for t in pre_b.split())
    # doc 1 (first occurrence) keeps everything
    assert cdc[1]["n_kept"] == cdc[1]["n_segments"]
    # reconstruction invariant: concatenating kept segments of doc 1
    # in order reproduces the document
    assert cdc[1]["clean_text"] == f"{pre_a} {boiler}"


def test_segment_dedup_cdc_determinism_and_mode_guard(spark):
    import pytest as _pytest

    import skylinemapreducehadoop_spark.operators.dedup as D

    rows = [(i, f"tok{i % 7} common run of words {i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, D.segment_dedup(df, width=5, mode="cdc").collect()))
    b = sorted(
        map(tuple, D.segment_dedup(df.repartition(13), width=5, mode="cdc").collect())
    )
    assert a == b
    with _pytest.raises(ValueError):
        D.segment_dedup(df, mode="rolling")


def test_contamination_check_fuzzy_flags_perturbed_eval_docs(spark):
    """Fuzzy decontamination: a one-token-prefix-perturbed eval doc
    (no exact match anywhere) is flagged with high Jaccard; unrelated
    docs stay clean with 0.0."""
    from pyspark.sql import functions as F

    docs = _make_docs(spark)
    bench = docs.where(F.col("doc_id") == 5).select(
        F.col("doc_id"), F.concat(F.lit("zz "), F.col("text")).alias("text")
    )
    out = {
        r["doc_id"]: r
        for r in D.contamination_check_fuzzy(docs, bench, threshold=0.5).collect()
    }
    assert out[5]["contaminated"] and out[5]["max_eval_jaccard"] > 0.8
    # every doc appears exactly once; unrelated docs report 0.0
    assert len(out) == docs.count()
    clean = [r for i, r in out.items() if i not in (5,)]
    assert all(not r["contaminated"] for r in clean)
    assert all(r["max_eval_jaccard"] == 0.0 for r in clean)


def test_incremental_dedup_batch_vs_corpus(spark):
    from skylinemapreducehadoop_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha"),   # already in corpus -> dropped
            (11, "delta"),   # new -> kept
            (12, "delta"),   # batch-internal dup -> dropped (11 wins)
            (13, "beta"),    # already in corpus -> dropped
            (14, None),      # NULL text never matches -> kept
            (15, None),      # every NULL row kept (no content to equate)
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in incremental_dedup(corpus, batch).collect()
    )
    assert got == [11, 14, 15]
    # corpus is never self-deduplicated: corpus rows are not output
    assert all(g >= 10 for g in got)


def test_incremental_dedup_only_hashes_shuffle(spark):
    from skylinemapreducehadoop_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, f"doc {i % 50}") for i in range(60)], "doc_id long, text string"
    )
    plan = (
        incremental_dedup(corpus, batch)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the corpus side of the anti-join projects ONLY the md5 key —
    # document bodies must not cross the corpus shuffle
    import re

    anti = plan[plan.find("LeftAnti") :]
    assert "md5" in anti


def test_duplicate_spans_known_answer(spark):
    from skylinemapreducehadoop_spark.operators.dedup import duplicate_spans

    boiler = "one two three four"  # repeated 4-gram across docs
    rows = [
        (1, f"{boiler} alpha beta gamma delta {boiler}"),
        (2, f"unique opening words here {boiler} tail x"),
        (3, "totally novel content with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, n=4).collect()
    }
    # doc1 tokens: boiler(0-3) alpha beta gamma delta(4-7) boiler(8-11)
    # -> spans [0,3] and [8,11]; doc2: boiler at position 4 -> [4,7]
    assert got == {(1, 0, 3, 4), (1, 8, 11, 4), (2, 4, 7, 4)}


def test_duplicate_spans_merges_overlapping_and_adjacent(spark):
    from skylinemapreducehadoop_spark.operators.dedup import duplicate_spans

    # 'a b c d e' repeated -> in a doc containing it twice back-to-back
    # every covering 3-gram is duplicated and the covered ranges merge
    # into one maximal span
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, n=3).collect()
    )
    # every 3-gram of the repeated phrase occurs >= 2x -> full coverage
    assert got == [(1, 0, 9), (2, 0, 4)]


def test_duplicate_spans_short_docs_and_no_dups(spark):
    from skylinemapreducehadoop_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "too short"), (2, "also brief"), (3, "x y z w"), (4, "p q r s")],
        "doc_id long, text string",
    )
    # nothing repeats at 3-gram granularity -> empty result
    assert duplicate_spans(df, n=3).count() == 0


def test_duplicate_spans_randomized_vs_bruteforce(spark):
    import random

    from skylinemapreducehadoop_spark.operators.dedup import duplicate_spans

    rng = random.Random(4111)
    n = 3
    docs = [
        (i, " ".join(rng.choice("abcde") for _ in range(rng.randrange(2, 25))))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, n=n).collect()
    }
    # brute force: count every n-gram occurrence, merge covered ranges
    from collections import Counter

    toks = {i: t.split() for i, t in docs}
    counts = Counter(
        " ".join(v[p : p + n]) for v in toks.values() for p in range(len(v) - n + 1)
    )
    want = set()
    for i, v in toks.items():
        hits = [
            p for p in range(len(v) - n + 1) if counts[" ".join(v[p : p + n])] >= 2
        ]
        # merge rule: a hit extends the previous span when its range
        # overlaps or is adjacent (p <= prev_end + 1)
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], p + n - 1)
            else:
                spans.append((p, p + n - 1))
        want.update((i, a, b) for a, b in spans)
    assert got == want


def test_golden_records_survivorship(spark):
    from skylinemapreducehadoop_spark.operators.dedup import golden_records

    rows = [
        # cluster 1: city vote 2-1; phone has a NULL that must not vote
        (1, "Springfield", "555-1"),
        (1, "Springfield", None),
        (1, "Shelbyville", "555-2"),
        # cluster 2: 1-1 tie on city -> smallest value wins
        (2, "Bville", "111"),
        (2, "Aville", "222"),
        # cluster 3: field entirely NULL -> NULL in the golden record
        (3, None, "9"),
    ]
    df = spark.createDataFrame(rows, "cluster long, city string, phone string")
    got = {r["cluster"]: r for r in golden_records(df, "cluster", ["city", "phone"]).collect()}
    assert got[1]["city"] == "Springfield"
    assert got[1]["phone"] == "555-1"  # 1-1 tie between 555-1/555-2 -> smallest
    assert got[2]["city"] == "Aville"
    assert got[3]["city"] is None and got[3]["phone"] == "9"
    import pytest

    with pytest.raises(ValueError):
        golden_records(df, "cluster", [])


def test_golden_records_hostile_field_names_and_all_null_cluster(spark):
    """r9 ADVICE regressions: (a) field names with backticks / quotes /
    dots melt fine (no SQL-string interpolation anywhere), (b) a
    cluster whose EVERY field is NULL still appears as an all-NULL
    golden row instead of vanishing."""
    from pyspark.sql import types as T

    from skylinemapreducehadoop_spark.operators.dedup import golden_records

    hostile = ["wei`rd", "it's", "a.b"]
    schema = T.StructType(
        [T.StructField("cluster", T.LongType())]
        + [T.StructField(f, T.StringType()) for f in hostile]
    )
    rows = [
        (1, "x", "y", "z"),
        (1, "x", None, "z2"),
        (2, None, None, None),  # all-NULL cluster must survive
    ]
    df = spark.createDataFrame(rows, schema)
    out = golden_records(df, "cluster", hostile)
    assert out.columns == ["cluster"] + hostile
    got = {r["cluster"]: r for r in out.collect()}
    assert len(got) == 2
    assert got[1][hostile[0]] == "x" and got[1][hostile[1]] == "y"
    assert got[1][hostile[2]] == "z"  # tie z/z2 -> smallest
    assert all(got[2][f] is None for f in hostile)


def test_novelty_score_planted(spark):
    from skylinemapreducehadoop_spark.operators.dedup import novelty_score

    rows = [
        (1, "alpha beta gamma delta"),        # 2 trigrams, both unique
        (2, "the same shared boilerplate"),   # identical to doc 3
        (3, "the same shared boilerplate"),
        (4, "too short"),                     # < 3 tokens -> 0 grams
        (5, None),
        (6, "alpha beta gamma epsilon"),      # shares 'alpha beta gamma' with 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in novelty_score(df, k=3).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_unique"] == 1
    assert got[1]["novelty"] == 0.5  # 'beta gamma delta' unique, shared head not
    assert got[2]["novelty"] == 0.0 and got[3]["novelty"] == 0.0
    assert got[4]["n_grams"] == 0 and got[4]["novelty"] == 0.0
    assert got[5]["n_grams"] == 0 and got[5]["novelty"] == 0.0
    assert got[6]["n_unique"] == 1  # 'beta gamma epsilon'


def test_containment_pairs_subset_doc(spark):
    from skylinemapreducehadoop_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    long_doc = "zero one two three " + short + " four five six seven eight nine"
    rows = [(1, short), (2, long_doc), (3, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_pairs(df, threshold=0.9).collect()
    # the short doc's 3 grams all occur in the long doc -> containment 1.0
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["shared"] == r["n_a"] == 3
    assert r["containment"] == 1.0


def test_containment_pairs_vs_bruteforce(spark):
    import itertools

    from skylinemapreducehadoop_spark.operators.dedup import containment_pairs

    rng_words = ["w%d" % (i % 7) for i in range(30)]
    docs = [
        (i, " ".join(rng_words[j % 30] for j in range(i, i + 12)))
        for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["shared"], r["n_a"], r["n_b"])
        for r in containment_pairs(df, threshold=0.0).collect()
    }

    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        ga, gb = grams(ta), grams(tb)
        shared = len(ga & gb)
        if shared == 0:
            assert (ia, ib) not in got
        else:
            assert got[(ia, ib)] == (shared, len(ga), len(gb))


def test_containment_pairs_stop_gram_ceiling(spark):
    from skylinemapreducehadoop_spark.operators.dedup import containment_pairs

    # one boilerplate gram shared by all docs; with the df ceiling at 2
    # it must not generate any candidate pair on its own
    boiler = "terms of service"
    rows = [(i, boiler + " unique%d filler%d tail%d" % (i, i, i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, threshold=0.01).count() == 10  # all pairs share boiler grams
    pruned = containment_pairs(df, threshold=0.01, max_gram_df=2)
    assert pruned.count() == 0


# ---------------------------------------------------------------------------
# boilerplate_segments / strip_boilerplate (round 10)


def _banner_corpus(spark):
    # 6 unique docs; docs 0,1,2 share an 8-token banner prefix;
    # doc 5 is whitespace-only (empty-doc contract)
    banner = "one two three four five six seven eight"
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "red orange yellow green blue indigo violet ultra infra deep",
        "spark shuffles keys across partitions when grouping by a key",
        "ducks swim in rows under bridges at dawn every single day",
    ]
    rows = [(i, (banner + " " + b) if i < 3 else b) for i, b in enumerate(bodies)]
    rows.append((5, "   "))
    return spark.createDataFrame(rows, "doc_id long, text string"), banner


def test_boilerplate_flags_planted_banner(spark):
    from skylinemapreducehadoop_spark.operators.dedup import boilerplate_segments

    df, banner = _banner_corpus(spark)
    out = boilerplate_segments(df, width=8, min_docs=3).collect()
    assert len(out) == 1
    assert out[0]["segment"] == banner
    assert out[0]["doc_freq"] == 3
    assert out[0]["first_doc"] == 0


def test_boilerplate_within_doc_repeat_counts_once(spark):
    from skylinemapreducehadoop_spark.operators.dedup import boilerplate_segments

    seg = "a b c d e f g h"
    # one doc repeating the segment 5 times is ONE document
    df = spark.createDataFrame(
        [(1, " ".join([seg] * 5)), (2, seg), (3, "x y z w v u t s")],
        "doc_id long, text string",
    )
    out = {r["segment"]: r for r in boilerplate_segments(df, width=8, min_docs=2).collect()}
    assert out[seg]["doc_freq"] == 2


def test_strip_boilerplate_removes_and_rebuilds(spark):
    from skylinemapreducehadoop_spark.operators.dedup import strip_boilerplate

    df, banner = _banner_corpus(spark)
    out = {r["doc_id"]: r for r in strip_boilerplate(df, width=8, min_docs=3).collect()}
    assert len(out) == 6
    # banner docs lose exactly the banner segment, keep their body
    for i in (0, 1, 2):
        assert out[i]["n_flagged"] == 1
        assert banner not in out[i]["clean_text"]
        assert out[i]["clean_text"].split()  # body survives
    # clean docs unchanged
    for i in (3, 4):
        assert out[i]["n_flagged"] == 0
        assert out[i]["clean_text"] == df.where(F.col("doc_id") == i).collect()[0]["text"]
    # empty doc contract: stays, zero segments
    assert out[5]["clean_text"] == ""
    assert out[5]["n_segments"] == 0 and out[5]["n_flagged"] == 0


def test_strip_boilerplate_order_preserved(spark):
    from skylinemapreducehadoop_spark.operators.dedup import strip_boilerplate

    seg = "p q r s t u v w"
    # doc where boilerplate sits in the MIDDLE: surviving segments
    # must rejoin in original order
    body_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    body_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = spark.createDataFrame(
        [(1, f"{body_a} {seg} {body_b}"), (2, seg), (3, seg)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_boilerplate(df, width=8, min_docs=3).collect()}
    assert out[1]["clean_text"] == f"{body_a} {body_b}"
    assert out[2]["clean_text"] == "" and out[2]["n_flagged"] == 1


def test_dedup_threshold_sweep_monotone_and_exact(spark):
    from pyspark.sql import functions as F
    from skylinemapreducehadoop_spark.operators.dedup import (
        dedup_threshold_sweep,
        setsim_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1 -> jaccard 1.0
        (3, base + " extra words appended here"),  # high-but-<1 overlap
        (4, "completely different text with no shared shingles at all"),
        (5, "another unrelated document about other things entirely ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    curve = {
        r["threshold"]: r for r in dedup_threshold_sweep(df).collect()
    }
    # monotone: tightening the threshold never adds pairs or docs
    ts = sorted(curve)
    for a, b in zip(ts, ts[1:]):
        assert curve[a]["n_pairs"] >= curve[b]["n_pairs"]
        assert curve[a]["n_docs"] >= curve[b]["n_docs"]
    # the exact-dup pair survives every threshold including 1.0
    assert curve[1.0]["n_pairs"] >= 1 and curve[1.0]["n_docs"] >= 2
    # each band agrees with an independent setsim run AT that threshold
    for t in (0.5, 1.0):
        direct = setsim_join(df, threshold=t).count()
        assert curve.get(t, {"n_pairs": 0})["n_pairs"] == direct
