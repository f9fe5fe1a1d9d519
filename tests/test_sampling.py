"""Deterministic content-hash sampling tests."""

from __future__ import annotations

import hashlib

import pytest

from skylinemapreducehadoop_spark.operators import sampling as SA


def _docs(spark, n=400):
    rows = [(i, f"doc number {i} with body {i * 7 % 101}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket(text: str, buckets: int = 1_000_000) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16) % buckets


def test_hash_sample_matches_reference_and_rate(spark):
    df = _docs(spark)
    got = {r["doc_id"] for r in SA.hash_sample(df, ["text"], 0.3).collect()}
    want = {
        i for i in range(400) if _bucket(f"doc number {i} with body {i * 7 % 101}") < 300_000
    }
    assert got == want
    assert 0.2 < len(got) / 400 < 0.4  # ~30%


def test_hash_sample_partitioning_invariant(spark):
    """The whole point: the sample must not depend on physical layout."""
    df = _docs(spark)
    a = {r["doc_id"] for r in SA.hash_sample(df.repartition(1), ["text"], 0.25).collect()}
    b = {r["doc_id"] for r in SA.hash_sample(df.repartition(17), ["text"], 0.25).collect()}
    assert a == b


def test_hash_sample_no_shuffle(spark):
    df = _docs(spark)
    plan = (
        SA.hash_sample(df, ["text"], 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_hash_sample_rejects_bad_fraction(spark):
    df = _docs(spark, n=5)
    for frac in (-0.1, 1.5):
        with pytest.raises(ValueError):
            SA.hash_sample(df, ["text"], frac)


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 else "de", f"t{i}") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = SA.stratified_hash_sample(
        df, "lang", {"en": 1.0, "de": 0.0}, key_cols=["text"]
    ).collect()
    langs = {r["lang"] for r in out}
    assert langs == {"en"}
    assert len(out) == 300  # en fraction 1.0 keeps every en row


def test_reservoir_exact_k_deterministic(spark):
    df = _docs(spark)
    got = [r["doc_id"] for r in SA.reservoir_sample(df, 25, ["text"]).collect()]
    assert len(got) == 25
    # matches the brute-force smallest-hash selection
    keyed = sorted(
        range(400),
        key=lambda i: (
            int(hashlib.md5(f"doc number {i} with body {i * 7 % 101}".encode()).hexdigest()[:15], 16),
            f"doc number {i} with body {i * 7 % 101}",
        ),
    )
    assert sorted(got) == sorted(keyed[:25])
    # and is layout-invariant
    again = [r["doc_id"] for r in SA.reservoir_sample(df.repartition(13), 25, ["text"]).collect()]
    assert sorted(again) == sorted(got)


def test_stratified_requires_key_cols_for_fractional_rates(spark):
    # keying on the stratum alone keeps 100% or 0% of a stratum — the
    # degenerate default must be rejected for fractional rates
    rows = [(i, "en" if i % 2 else "de", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    with pytest.raises(ValueError, match="key_cols"):
        SA.stratified_hash_sample(df, "lang", {"en": 0.3})
    # all-or-nothing rates don't depend on the key: omitting it is fine
    keep_all = SA.stratified_hash_sample(df, "lang", {"en": 1.0}, default_fraction=0.0)
    assert keep_all.count() == 50


def test_hash_bucket_null_position_distinguished(spark):
    # concat_ws alone would skip NULLs: ('a', NULL, 'b') and
    # ('a', 'b', NULL) must hash differently
    df = spark.createDataFrame(
        [(1, "a", None, "b"), (2, "a", "b", None)], "id int, x string, y string, z string"
    )
    rows = df.select(
        "id", SA._hash_bucket(["x", "y", "z"], SA._BUCKETS).alias("b")
    ).collect()
    buckets = {r["id"]: r["b"] for r in rows}
    assert buckets[1] != buckets[2]


def test_mix_corpus_proportions_and_determinism(spark):
    from skylinemapreducehadoop_spark.operators.sampling import mix_corpus

    rows = [(f"s{i % 3}", f"text-{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "source string, text string")
    weights = {"s0": 2, "s1": 1}  # s2 unlisted -> dropped
    out = mix_corpus(df, weights)
    from pyspark.sql import functions as F

    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"s0", "s1"}
    # scale stratum: n/w smallest is s1 (1000/1) vs s0 (1000/2) -> s0
    # kept whole, s1 thinned to ~half its size
    assert counts["s0"] == 1000
    assert abs(counts["s1"] - 500) < 80
    # partitioning-independent: same rows on a different layout
    a = sorted(r["text"] for r in out.collect())
    b = sorted(r["text"] for r in mix_corpus(df.repartition(13), weights).collect())
    assert a == b


def test_mix_corpus_rejects_bad_weights(spark):
    import pytest
    from skylinemapreducehadoop_spark.operators.sampling import mix_corpus

    df = spark.createDataFrame([("s0", "x")], "source string, text string")
    with pytest.raises(ValueError):
        mix_corpus(df, {})
    with pytest.raises(ValueError):
        mix_corpus(df, {"s0": 0})


def test_stratified_topk_exact_k_per_stratum(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sampling import stratified_topk_sample

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    out = stratified_topk_sample(df, "src", 4, ["text"])
    per = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic under repartitioning (content-hash order, no RNG)
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in stratified_topk_sample(df.repartition(13), "src", 4, ["text"]).collect())
    assert a == b
    # stratum smaller than k: keep all of it, no padding
    small = df.where((F.col("src") != "s2") | (F.col("id") < 6))
    kept = stratified_topk_sample(small, "src", 4, ["text"])
    assert kept.where(F.col("src") == "s2").count() == 2


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    from skylinemapreducehadoop_spark.operators.sampling import weighted_sample

    rows = [(i, f"doc number {i} text", (i % 7) * 10 + 1) for i in range(120)]
    rows += [(500, "zero weight", 0), (501, None, 50), (502, "negweight", -3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w int")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(
            df.where(df.text.isNotNull()), 10, "w", ["text"], tiebreak_cols=["doc_id"]
        ).collect()
    )

    B = 1 << 52
    def pri(text, w):
        h = int(hashlib.md5(text.encode()).hexdigest()[:15], 16) % B
        u = (h + 1) / float(B + 1)
        return math.log(u) / w

    ref = sorted(
        (pri(t, w), i) for i, t, w in rows if t is not None and w > 0
    )
    want = sorted(i for _, i in sorted(((-p, i) for p, i in ref))[:10])
    assert got == want
    # zero/negative-weight and NULL rows never sampled
    assert not {500, 501, 502} & set(got)
    # partition-invariance
    again = sorted(
        r["doc_id"]
        for r in weighted_sample(
            df.where(df.text.isNotNull()).repartition(13),
            10, "w", ["text"], tiebreak_cols=["doc_id"],
        ).collect()
    )
    assert again == got


def test_weighted_sample_favors_heavy_weights(spark):
    from skylinemapreducehadoop_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) + 20 heavy rows (w=1000): a k=20 sample
    # should be dominated by heavy rows (P[heavy wins a slot] >> 1/2)
    rows = [(i, f"light row {i}", 1) for i in range(200)]
    rows += [(1000 + i, f"heavy row {i}", 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w int")
    got = {r["doc_id"] for r in weighted_sample(df, 20, "w", ["text"]).collect()}
    n_heavy = sum(1 for i in got if i >= 1000)
    assert n_heavy >= 15, n_heavy


def test_temperature_mix_sqrt_rebalancing(spark):
    """6:3:1 skew -> sqrt weights thin the head hardest and keep the
    scale-setting tail whole; thresholds are exact integer floors the
    test recomputes independently."""
    import math

    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sampling import temperature_mix

    rows = (
        [("head", f"h{i}") for i in range(600)]
        + [("mid", f"m{i}") for i in range(300)]
        + [("tail", f"t{i}") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "source string, text string")
    kept = temperature_mix(df).groupBy("source").agg(F.count("*").alias("n"))
    got = {r["source"]: r["n"] for r in kept.collect()}
    # scale stratum = argmin n/floor(sqrt(n)): 600/24=25, 300/17=17.6,
    # 100/10=10 -> tail; tail threshold = buckets (kept whole)
    assert got["tail"] == 100
    w = {s: math.floor(math.sqrt(n)) for s, n in (("head", 600), ("mid", 300), ("tail", 100))}
    # expected keep fraction per stratum = floor(1e6 * 100*w_s/(10*n_s))/1e6
    for s, n in (("head", 600), ("mid", 300)):
        frac = (1_000_000 * 100 * w[s]) // (10 * n) / 1_000_000
        assert abs(got[s] / n - frac) < 0.08, (s, got[s], frac)
    # determinism: the same input yields the same kept set
    a = {r["text"] for r in temperature_mix(df).collect()}
    b = {r["text"] for r in temperature_mix(df).collect()}
    assert a == b


def test_leakage_safe_split_clusters_never_straddle(spark):
    from skylinemapreducehadoop_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # two chains {0,1,2,3} and {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == 40
    by_id = {r["id"]: r for r in out}
    # cluster members share cluster_id AND split
    for grp in ([0, 1, 2, 3], [10, 11]):
        cids = {by_id[i]["cluster_id"] for i in grp}
        splits = {by_id[i]["split"] for i in grp}
        assert cids == {min(grp)}
        assert len(splits) == 1
    # singletons are their own cluster
    assert by_id[25]["cluster_id"] == 25
    # every doc got a split from the declared set
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_leakage_safe_split_weights_and_determinism(spark):
    import pytest as _pytest

    from skylinemapreducehadoop_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    a = {r["id"]: r["split"] for r in leakage_safe_split(docs, pairs).collect()}
    b = {
        r["id"]: r["split"]
        for r in leakage_safe_split(docs.repartition(7), pairs).collect()
    }
    assert a == b  # layout-independent
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.6 < frac_train < 0.95  # roughly the 80% band
    with _pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, weights={"train": 50, "test": 49})


def test_negative_pairs_contract(spark):
    from skylinemapreducehadoop_spark.operators.sampling import negative_pairs

    docs = [(i, "doc number %d words body %d" % (i, i * 7)) for i in range(60)]
    docs += [(100, docs[0][1])]  # exact dup of doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = negative_pairs(df, k=3, buckets=8).collect()
    pairs = {(r["id"], r["neg_id"]) for r in out}
    # no self pairs, and never an exact-text twin as a negative
    assert all(a != b for a, b in pairs)
    assert (0, 100) not in pairs and (100, 0) not in pairs
    # deterministic under repartition
    out2 = {
        (r["id"], r["neg_id"])
        for r in negative_pairs(df.repartition(13), k=3, buckets=8).collect()
    }
    assert pairs == out2
    # every anchor present gets at most k negatives
    from collections import Counter

    per_anchor = Counter(a for a, _ in pairs)
    assert max(per_anchor.values()) <= 3


def test_negative_pairs_excludes_near_dups(spark):
    from skylinemapreducehadoop_spark.operators.sampling import negative_pairs

    docs = [(i, "unique text %d tail %d" % (i, i)) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {
        (r["id"], r["neg_id"])
        for r in negative_pairs(df, k=5, buckets=4).collect()
    }
    assert base  # non-vacuous
    sample = list(base)[:3]
    ex = spark.createDataFrame(sample, "id_a long, id_b long")
    got = {
        (r["id"], r["neg_id"])
        for r in negative_pairs(df, k=5, buckets=4, exclude_pairs=ex).collect()
    }
    for a, b in sample:
        assert (a, b) not in got and (b, a) not in got
    assert got == base - {(a, b) for a, b in sample} - {(b, a) for a, b in sample}


def test_negative_pairs_validates_params(spark):
    import pytest as _pytest

    from skylinemapreducehadoop_spark.operators.sampling import negative_pairs

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        negative_pairs(df, k=0)
    with _pytest.raises(ValueError):
        negative_pairs(df, buckets=1)


def test_grouped_topk_equals_window_and_partitioning_invariant(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sampling import grouped_topk

    rows = [(i % 7, (i * 131) % 1000, i) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v long, id long")
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.desc("id"))
    ref = {
        (r["g"], r["rk"]): (r["id"], r["v"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .collect()
    }
    for nparts in (1, 13):
        got = {
            (r["g"], r["rank"]): (r["id"], r["v"])
            for r in grouped_topk(
                df.repartition(nparts),
                ["g"],
                ["v", "id"],
                5,
                payload_cols=["id", "v"],
            ).collect()
        }
        assert got == ref, f"nparts={nparts}"
    import pytest

    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], ["v"], 0)


def test_grouped_topk_ascending(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sampling import grouped_topk

    rows = [(1, v, v) for v in (30, 10, 20, 40)]
    df = spark.createDataFrame(rows, "g int, v long, id long")
    got = [
        (r["rank"], r["v"])
        for r in grouped_topk(
            df, ["g"], ["v", "id"], 2, descending=False
        ).orderBy("rank").collect()
    ]
    assert got == [(1, 10), (2, 20)]


# ---------------------------------------------------------------------------
# mix_diversity (round 10)


def test_mix_diversity_uniform_and_degenerate(spark):
    import math
    import pytest
    from skylinemapreducehadoop_spark.operators.sampling import mix_diversity

    rows = [("en", f"s{i % 4}") for i in range(40)] + [("zh", "only")] * 7
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {r["lang"]: r for r in mix_diversity(df, "lang", "source").collect()}
    # uniform over 4 sources: H = ln 4, effective = 4
    assert out["en"]["n_units"] == 4
    assert out["en"]["shannon_h"] == pytest.approx(math.log(4), abs=1e-5)
    assert out["en"]["effective_units"] == pytest.approx(4.0, abs=1e-4)
    assert out["en"]["simpson"] == pytest.approx(1 - (10 * 9 * 4) / (40 * 39), abs=1e-9)
    # single source: zero diversity
    assert out["zh"]["shannon_h"] == 0.0
    assert out["zh"]["effective_units"] == 1.0
    assert out["zh"]["simpson"] == 0.0


def test_mix_diversity_matches_reference(spark):
    import math
    import pytest
    from skylinemapreducehadoop_spark.operators.sampling import mix_diversity

    counts = {"a": 7, "b": 3, "c": 15, "d": 1}
    rows = [("g", u) for u, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "lang string, source string")
    row = mix_diversity(df, "lang", "source").collect()[0]
    n = sum(counts.values())
    h = -sum(c / n * math.log(c / n) for c in counts.values())
    assert row["shannon_h"] == pytest.approx(h, abs=1e-5)
    assert row["effective_units"] == pytest.approx(math.exp(h), abs=1e-4)


def test_balanced_shards_determinism_and_balance(spark):
    import pytest
    from skylinemapreducehadoop_spark.operators.sampling import balanced_shards

    import numpy as np

    rng = np.random.default_rng(13)
    rows = [(int(i), int(s)) for i, s in enumerate(rng.integers(100, 10000, 400))]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = balanced_shards(df, "n_chars", n_shards=8, id_cols=("doc_id",)).collect()
    assert len(out) == 8
    assert sum(r["n_rows"] for r in out) == 400
    totals = [r["total_size"] for r in out]
    assert sum(totals) == sum(s for _, s in rows)
    # striped LPT over 400 varied sizes: within a few percent of ideal
    ideal = sum(totals) / 8
    for t in totals:
        assert abs(t - ideal) / ideal < 0.05
    for r in out:
        assert r["balance"] == pytest.approx(r["total_size"] * 8 / sum(totals), abs=1e-9)
    # manual reference: rank desc by (size, id), stripe
    ranked = sorted(rows, key=lambda p: (-p[1], p[0]))
    manual = [0] * 8
    for pos, (_, s) in enumerate(ranked):
        manual[pos % 8] += s
    assert sorted(totals) == sorted(manual)


def test_balanced_shards_validation(spark):
    import pytest
    from skylinemapreducehadoop_spark.operators.sampling import balanced_shards

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    with pytest.raises(ValueError):
        balanced_shards(df, "n_chars", n_shards=0)
