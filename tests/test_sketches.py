"""Sketch aggregates: approximate answers must land near exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """The GK quantile sketch at accuracy 10000 guarantees rank error
    <= n/10000; assert the approximate p50/p90 land inside a generous
    +/-2% RANK band of the exact distribution (value tolerance is
    meaningless for arbitrary distributions, rank tolerance is the
    sketch's actual contract)."""
    from skylinemapreducehadoop_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bands = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.48).alias("p50_lo"),
            F.percentile("value", 0.52).alias("p50_hi"),
            F.percentile("value", 0.88).alias("p90_lo"),
            F.percentile("value", 0.92).alias("p90_hi"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
            F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("ap90"),
        )
        .collect()
    }
    assert set(bands) == set(approx)
    for k, b in bands.items():
        a = approx[k]
        assert b["p50_lo"] <= a["ap50"] <= b["p50_hi"], (k, a["ap50"])
        assert b["p90_lo"] <= a["ap90"] <= b["p90_hi"], (k, a["ap90"])


class TestHeavyHitters:
    def _skewed(self, spark, n_hot=5000, n_tail=2000):
        # 3 hot values dominate; long tail of singletons spread over
        # many partitions so per-partition MG summaries must merge
        from pyspark.sql import functions as F

        hot = spark.range(n_hot).select(
            F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")).alias("v")
        )
        tail = spark.range(n_tail).select(
            F.concat(F.lit("tail"), F.col("id").cast("string")).alias("v")
        )
        return hot.union(tail).repartition(16)

    def test_exact_counts_and_no_misses(self, spark):
        from pyspark.sql import functions as F

        from skylinemapreducehadoop_spark.operators.sketches import heavy_hitters

        df = self._skewed(spark)
        n = 5000 + 2000
        got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", threshold_ratio=0.1).collect()}
        # hot0 appears ceil(5000/3)=1667 or 1666 times; threshold = 700
        exact = {
            r["v"]: r["cnt"]
            for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()
            if r["cnt"] >= 0.1 * n
        }
        assert got == exact
        assert set(got) == {"hot0", "hot1", "hot2"}

    def test_small_counters_force_decrements(self, spark):
        # counters barely above the guarantee bound: candidates shrink,
        # but no qualifying value may be lost and counts stay exact
        from skylinemapreducehadoop_spark.operators.sketches import heavy_hitters

        df = self._skewed(spark, n_hot=3000, n_tail=4000)
        got = {r["value"]: r["cnt"] for r in heavy_hitters(
            df, "v", threshold_ratio=0.1, counters=11).collect()}
        assert set(got) == {"hot0", "hot1", "hot2"}
        assert sum(got.values()) == 3000

    def test_counter_guard(self, spark):
        from skylinemapreducehadoop_spark.operators.sketches import heavy_hitters
        import pytest

        with pytest.raises(ValueError):
            heavy_hitters(self._skewed(spark), "v", threshold_ratio=0.01, counters=50)

    def test_no_shuffle_before_candidates(self, spark):
        # the MG pass itself is narrow: no Exchange above the scan in
        # the candidate plan until the final distinct
        from skylinemapreducehadoop_spark.operators.sketches import mg_candidates

        df = self._skewed(spark)
        plan = mg_candidates(df, "v", 100)._jdf.queryExecution().executedPlan().toString()
        # exactly the distinct's two exchanges (partial/final around
        # shuffle) and the test fixture's own repartition — no
        # vocabulary-sized groupBy exchange
        assert plan.count("Exchange") <= 2 + 1


def test_heavy_hitters_property_random_inputs(spark):
    """MG + exact recount equals plain groupBy/HAVING for random value
    distributions, partition counts, and counter budgets at the
    guarantee bound — the theory, checked empirically."""
    import random

    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sketches import heavy_hitters

    rng = random.Random(1234)
    for trial in range(3):
        n_vals = rng.randint(5, 40)
        weights = [rng.randint(1, 50) for _ in range(n_vals)]
        rows = [(f"v{i}",) for i, w in enumerate(weights) for _ in range(w)]
        rng.shuffle(rows)
        n = len(rows)
        ratio = rng.choice([0.05, 0.1, 0.2])
        # counters exactly at the smallest guaranteed-correct budget
        counters = int(1.0 / ratio) + 1
        df = spark.createDataFrame(rows, "v string").repartition(
            rng.randint(2, 12)
        )
        got = {
            r["value"]: r["cnt"]
            for r in heavy_hitters(
                df, "v", threshold_ratio=ratio, counters=counters
            ).collect()
        }
        # integer cnt >= ratio*n  <=>  cnt >= ceil(ratio*n), the
        # operator's threshold
        exact = {
            r["v"]: r["cnt"]
            for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()
            if r["cnt"] >= ratio * n
        }
        assert got == exact, (trial, n, ratio, counters)


def test_heavy_hitters_null_semantics(spark):
    # NULLs are excluded up front and n = non-null count (documented
    # contract, r6 ADVICE): a majority-NULL column must still report
    # the heavy non-null value, with its exact count, and never a
    # NULL row.
    from skylinemapreducehadoop_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 40 + [(None,)] * 60 + [("b",)] * 2
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "v", threshold_ratio=0.5).collect()}
    # n_nonnull = 42 -> threshold ceil(21) = 21: only "a" qualifies
    assert got == {"a": 40}


def test_kmv_exact_regime_and_merge_law(spark):
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    # 3 groups x overlapping members; k far above distinct -> exact
    rows = [("g1", "d1", f"u{i}") for i in range(40)]
    rows += [("g1", "d2", f"u{i}") for i in range(20, 70)]  # 30 overlap
    rows += [("g2", "d1", "solo")]
    df = spark.createDataFrame(rows, "g string, day string, u string")
    daily = kmv_sketch(df, ["g", "day"], "u", k=256)
    merged = kmv_merge(daily, ["g"], k=256).withColumn(
        "est", kmv_estimate("kmv", k=256)
    )
    got = {r["g"]: r for r in merged.collect()}
    assert got["g1"]["n_merged"] == 2 and got["g1"]["est"] == 70.0
    assert got["g2"]["est"] == 1.0
    # merge(day sketches) == sketch(all rows): same hash set below k
    direct = {
        r["g"]: sorted(r["kmv"])
        for r in kmv_sketch(df, ["g"], "u", k=256).collect()
    }
    assert sorted(got["g1"]["kmv"]) == direct["g1"]
    # partitioning invariance (the mergeable-summary law)
    rep = kmv_sketch(df.repartition(13), ["g"], "u", k=256).collect()
    assert {r["g"]: sorted(r["kmv"]) for r in rep} == direct


def test_kmv_estimator_accuracy_past_k(spark):
    from skylinemapreducehadoop_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    n = 50_000
    df = spark.range(n).selectExpr("'g' AS g", "CAST(id AS STRING) AS u")
    est = (
        kmv_sketch(df, ["g"], "u", k=1024)
        .select(kmv_estimate("kmv", k=1024).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - n) / n < 0.1  # ~1/sqrt(1024) ≈ 3% expected


def test_kmv_guards_and_nulls(spark):
    import pytest

    from skylinemapreducehadoop_spark.operators.sketches import kmv_sketch

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "a")], "g string, u string"
    )
    out = kmv_sketch(df, ["g"], "u", k=16).collect()[0]
    assert len(out["kmv"]) == 1  # NULLs never hash in; dups collapse
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "u", k=1)


# ---------------------------------------------------------------------------
# count-min sketch columns


def test_cm_never_undercounts_and_mostly_exact(spark):
    from skylinemapreducehadoop_spark.operators.sketches import (
        cm_merge,
        cm_query,
        cm_sketch,
    )

    rows = [("g", f"k{i % 37}") for i in range(1000)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "grp string, k string")
    sk = cm_sketch(df, ["grp"], "k", width=256, depth=4)
    est = {
        r["k"]: r["e"]
        for r in df.where(F.col("k").isNotNull())
        .select("k")
        .distinct()
        .crossJoin(sk.drop("grp"))
        .select("k", cm_query("cm", "k", width=256, depth=4).alias("e"))
        .collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["k"] is not None
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
    # 37 keys into 256 buckets x 4 rows: expect near-universal exactness
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits >= 30

    # merge linearity: sketch(A) + sketch(B) == sketch(A u B)
    a = df.where(F.crc32("k") % 2 == 0)
    b = df.where((F.crc32("k") % 2 == 1) | F.col("k").isNull())
    parts = cm_sketch(a, ["grp"], "k", width=256, depth=4).unionAll(
        cm_sketch(b, ["grp"], "k", width=256, depth=4)
    )
    merged = cm_merge(parts, ["grp"], width=256, depth=4)
    assert merged.collect()[0]["cm"] == sk.collect()[0]["cm"]


def test_cm_dense_array_shape_and_guards(spark):
    import pytest

    from skylinemapreducehadoop_spark.operators.sketches import cm_sketch

    df = spark.createDataFrame([("g", "x")], "grp string, k string")
    out = cm_sketch(df, ["grp"], "k", width=32, depth=3).collect()[0]["cm"]
    assert len(out) == 96 and sum(out) == 3 and min(out) == 0
    with pytest.raises(ValueError):
        cm_sketch(df, ["grp"], "k", width=1, depth=2)


# ---------------------------------------------------------------------------
# mergeable histogram columns


def test_hist_quantile_matches_exact_percentile_on_grid(spark):
    from skylinemapreducehadoop_spark.operators.sketches import (
        hist_merge,
        hist_quantile_edge,
        hist_sketch,
    )

    # values 0..999 in two day-halves; bin width 10 over [0, 1000)
    rows = [("d1", v) for v in range(500)] + [("d2", v) for v in range(500, 1000)]
    df = spark.createDataFrame(rows, "day string, v long").withColumn(
        "g", F.lit("all")
    )
    daily = hist_sketch(df, ["g", "day"], "v", lo=0, bin_width=10, bins=100)
    total = hist_merge(daily, ["g"], bins=100)
    got = total.select(
        hist_quantile_edge("hist", 1, 2, lo=0, bin_width=10).alias("p50"),
        hist_quantile_edge("hist", 9, 10, lo=0, bin_width=10).alias("p90"),
        F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x).alias("n"),
    ).collect()[0]
    # rank ceil(0.5*1000)=500 -> value 499 -> bin 49 -> edge 490
    assert got["p50"] == 490 and got["p90"] == 890 and got["n"] == 1000


def test_hist_clamps_out_of_range_and_empty_bins(spark):
    from skylinemapreducehadoop_spark.operators.sketches import (
        hist_quantile_edge,
        hist_sketch,
    )

    df = spark.createDataFrame(
        [("g", -50), ("g", 5), ("g", 995), ("g", 10_000), ("g", None)],
        "g string, v long",
    )
    out = hist_sketch(df, ["g"], "v", lo=0, bin_width=100, bins=10)
    hist = out.collect()[0]["hist"]
    assert len(hist) == 10
    assert hist[0] == 2  # -50 clamps into bin 0 alongside 5
    assert hist[9] == 2  # 995 natural + 10000 clamped; NULL dropped
    assert sum(hist) == 4
    edge = out.select(
        hist_quantile_edge("hist", 1, 1, lo=0, bin_width=100).alias("e")
    ).collect()[0]["e"]
    assert edge == 900  # p100 lands in the last bin
