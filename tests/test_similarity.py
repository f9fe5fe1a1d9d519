"""Similarity-search tests vs numpy brute force."""

from __future__ import annotations

import numpy as np

from skylinemapreducehadoop_spark.operators import similarity as S


def _vectors(spark, n=300, d=16, seed=0):
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, d))
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    return m, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_matches_numpy(spark):
    m, df = _vectors(spark)
    q = m[0]
    got = [r["vec_id"] for r in S.cosine_topk(df.where("vec_id != 0"), q, k=10).collect()]
    # numpy reference (float32 storage -> float64 math, like the operator)
    m32 = m.astype(np.float32).astype(np.float64)
    sims = (m32 @ q) / (np.linalg.norm(m32, axis=1) * np.linalg.norm(q))
    order = [i for i in np.argsort(-sims) if i != 0][:10]
    assert got == order


def test_ann_lsh_recall(spark):
    m, df = _vectors(spark, n=500)
    q = m[1]
    exact = {r["vec_id"] for r in S.cosine_topk(df.where("vec_id != 1"), q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in S.ann_lsh_topk(df.where("vec_id != 1"), q, k=10, n_planes=8, probe_bits=3).collect()
    }
    # multiprobe LSH on random data: expect decent overlap, exact top-1 present
    assert len(exact & approx) >= 5


def test_ivf_topk_recall(spark):
    m, df = _vectors(spark, n=500, seed=3)
    q = m[2]
    exact = {r["vec_id"] for r in S.cosine_topk(df.where("vec_id != 2"), q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in S.ivf_topk(df.where("vec_id != 2"), q, k=10, n_lists=8, n_probe=4).collect()
    }
    assert len(exact & approx) >= 5


def test_ivf_build_probe_persisted_index(spark, tmp_path):
    """The persisted-index path: probe must (a) prune partitions at the
    scan — only the probed __list directories are read — (b) run no
    full-data UDF stage, and (c) keep recall vs exact top-k."""
    m, df = _vectors(spark, n=500, seed=7)
    q = m[4]
    assigned, C = S.ivf_build(df.where("vec_id != 4"), n_lists=8)
    path = str(tmp_path / "ivf")
    S.ivf_write(assigned, C, path)

    assigned2, C2 = S.ivf_read(spark, path)
    assert np.allclose(C, C2)
    probe_df = S.ivf_probe(assigned2, C2, q, k=10, n_probe=4)

    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    # partition filter on __list reaches the file scan...
    assert "__list" in plan and "PartitionFilters" in plan
    # ...and the probe never re-assigns vectors (no pandas UDF stage
    # before the scoring; the only Python eval is the cosine rerank)
    assert plan.count("ArrowEvalPython") <= 1

    exact = {r["vec_id"] for r in S.cosine_topk(df.where("vec_id != 4"), q, k=10).collect()}
    approx = {r["vec_id"] for r in probe_df.collect()}
    assert len(exact & approx) >= 5


def test_embedding_near_dup_finds_planted(spark):
    rng = np.random.RandomState(2)
    base = rng.standard_normal((50, 16))
    near = base[:5] + rng.standard_normal((5, 16)) * 0.02  # cosine ~0.999
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(100 + i, [float(x) for x in v]) for i, v in enumerate(near)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["score"] for r in S.embedding_near_dup(df, threshold=0.98).collect()}
    for i in range(5):
        assert (i, 100 + i) in pairs
        assert pairs[(i, 100 + i)] > 0.98


def test_near_dup_plan_has_no_cartesian(spark):
    _, df = _vectors(spark, n=100)
    plan = S.embedding_near_dup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_cosine_topk_batch_matches_single_query(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
    )

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype(float)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = df.where("vec_id < 3").selectExpr(
        "vec_id as qid", "embedding as qvec"
    )
    batch = cosine_topk_batch(df, queries, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], round(r["score"], 6)))
    for qid in range(3):
        single = [
            (r["vec_id"], round(r["score"], 6))
            for r in cosine_topk(
                df.where(f"vec_id <> {qid}"), vecs[qid].tolist(), k=5
            ).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid


def test_cosine_topk_batch_string_ids(spark):
    """Query ids follow the queries frame's schema — string ids work
    end-to-end (r5 hardcoded int64 and crashed on non-integer ids),
    and exclude_self still drops the matching corpus row."""
    from skylinemapreducehadoop_spark.operators.similarity import cosine_topk_batch

    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("b", [0.9, 0.1]),
            ("c", [0.0, 1.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    queries = df.where("vec_id = 'a'").selectExpr(
        "vec_id as qid", "embedding as qvec"
    )
    got = cosine_topk_batch(df, queries, k=2).collect()
    assert {r["qid"] for r in got} == {"a"}
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: -r["score"])]
    assert ids == ["b", "c"]  # 'a' itself excluded
    assert dict(got[0].asDict())["qid"] == "a"
    assert cosine_topk_batch(df, queries, k=2).schema["qid"].dataType.typeName() == "string"


def test_cosine_topk_batch_rejects_bad_input(spark):
    import pytest

    from skylinemapreducehadoop_spark.operators.similarity import cosine_topk_batch

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    q = df.selectExpr("vec_id as qid", "embedding as qvec")
    with pytest.raises(ValueError):
        cosine_topk_batch(df, q, k=0)
    with pytest.raises(ValueError):
        cosine_topk_batch(df, q.where("qid < 0"), k=5)


def test_cosine_topk_batch_guards_corpus_sized_queries(spark):
    """A corpus-sized query set must fail fast (bounded limit-collect),
    not OOM the driver — the error points at knn_graph."""
    import numpy as np
    import pytest

    from skylinemapreducehadoop_spark.operators.similarity import cosine_topk_batch

    rng = np.random.default_rng(0)
    df = spark.createDataFrame(
        [(i, rng.standard_normal(4).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    q = df.selectExpr("vec_id as qid", "embedding as qvec")
    with pytest.raises(ValueError, match="knn_graph"):
        cosine_topk_batch(df, q, k=3, max_query_rows=5)


def _brute_knn(vecs, k, exclude_self=True):
    import numpy as np

    n = len(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    denom = norms[:, None] * norms[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(denom > 0, (vecs @ vecs.T) / denom, 0.0)
    if exclude_self:
        np.fill_diagonal(s, -np.inf)
    out = {}
    for q in range(n):
        order = sorted(range(n), key=lambda j: (-s[q, j], j))
        out[q] = [
            (j, round(float(s[q, j]), 6))
            for j in order[:k]
            if np.isfinite(s[q, j])
        ]
    return out


def test_knn_graph_matches_bruteforce_multiblock(spark):
    """Exact kNN graph == the numpy brute force, with block sizes small
    enough that every query meets the corpus across MANY cogrouped
    block pairs (the distributed merge path, not one big group)."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 8))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {}
    rows = knn_graph(df, k=4, q_block_rows=16, c_block_rows=32).collect()
    for r in rows:
        got.setdefault(r["qid"], []).append((r["vec_id"], r["score"]))
    want = _brute_knn(vecs, k=4)
    assert set(got) == set(want)
    for q in want:
        assert sorted(got[q]) == sorted(want[q]), q


def test_knn_graph_tie_break_deterministic(spark):
    """Planted exact duplicates (cosine ties at 1.0) resolve by
    ascending neighbor id, regardless of block splits."""
    from skylinemapreducehadoop_spark.operators.similarity import knn_graph

    # ids 0,1,2,3 all identical; 4,5 identical; one stray
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),
        (3, [3.0, 0.0]),
        (4, [0.0, 1.0]),
        (5, [0.0, 2.0]),
        (6, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {}
    for r in knn_graph(df, k=2, q_block_rows=2, c_block_rows=3).collect():
        out.setdefault(r["qid"], []).append(r["vec_id"])
    # for query 3: ids 0,1,2 all score 1.0 -> keep the two smallest ids
    assert out[3] == [0, 1]
    assert out[0] == [1, 2]


def test_embedding_cluster_dedup_keeps_representatives(spark):
    """SemDeDup composition: planted duplicate groups collapse to their
    min-id representative; distant vectors all survive."""
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import (
        embedding_cluster_dedup,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 16))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # group A: ids 100,101,102 duplicate id 0; group B: 200 duplicates 1
    rows += [(100, base[0].tolist()), (101, base[0].tolist()),
             (102, base[0].tolist()), (200, base[1].tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r["vec_id"] for r in embedding_cluster_dedup(df, threshold=0.95).collect()}
    assert {100, 101, 102, 200}.isdisjoint(kept)
    assert set(range(30)) <= kept


def test_knn_graph_never_collects(spark, monkeypatch):
    """The corpus-as-queries path must be driver-safe: fail the test if
    ANY DataFrame.collect / toPandas fires while building and running
    knn_graph (count()/foreach-free aggregation is allowed)."""
    import numpy as np
    from pyspark.sql import DataFrame

    from skylinemapreducehadoop_spark.operators import similarity as S2

    rng = np.random.default_rng(1)
    df = spark.createDataFrame(
        [(i, rng.standard_normal(4).tolist()) for i in range(50)],
        "vec_id long, embedding array<double>",
    )

    def boom(self, *a, **kw):  # pragma: no cover - should never run
        raise AssertionError("knn_graph collected rows to the driver")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "toArrow", boom, raising=False)
    out = S2.knn_graph(df, k=3, q_block_rows=16, c_block_rows=16)
    assert out.count() == 150  # 50 queries x 3 neighbors, no collect


def test_kmeans_lloyd_recovers_separated_clusters(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import kmeans_lloyd

    # 3 well-separated blobs in 8-d; margins >> float noise, so the
    # final assignment is stable under any partitioning
    rng = np.random.RandomState(7)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0, -10.0] * 4])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.randn(8) * 0.1).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, C = kmeans_lloyd(df, k=3, n_iter=5)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # every blob maps to exactly one cluster label and labels differ
    labels = [{got[i] for i in range(90) if i % 3 == c} for c in range(3)]
    assert all(len(s) == 1 for s in labels)
    assert len({next(iter(s)) for s in labels}) == 3
    # centroids land on the blob centers
    for c in range(3):
        lbl = next(iter(labels[c]))
        assert np.abs(C[lbl] - centers[c]).max() < 0.1
    # repartitioned input: identical final assignment
    got2 = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd(df.repartition(11), k=3, n_iter=5)[0].collect()}
    assert got2 == got


def test_kmeans_lloyd_guards(spark):
    import pytest

    from skylinemapreducehadoop_spark.operators.similarity import kmeans_lloyd

    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=5)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)


def test_quantize_embeddings_matches_numpy_reference(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import (
        quantize_embeddings,
        quantize_roundtrip_check,
    )

    rng = np.random.default_rng(55)
    vecs = [rng.normal(size=8).astype(np.float32) for _ in range(20)]
    vecs.append(np.zeros(8, dtype=np.float32))  # zero vector edge
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: (r["scale"], r["qvec"]) for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        x = v.astype(np.float64)
        amax = float(np.max(np.abs(x)))
        s = amax / 127.0
        if s > 0:
            q = [int(min(127, max(-127, np.floor(xi / s + 0.5)))) for xi in x]
        else:
            q = [0] * len(x)
        assert got[i][0] == s, i
        assert got[i][1] == q, i
        # reconstruction bound
        if s > 0:
            assert max(abs(qi * s - xi) for qi, xi in zip(q, x)) <= s / 2 + 1e-12
    chk = quantize_roundtrip_check(df).collect()
    assert all(r["err_ok"] for r in chk)


def test_quantized_ranking_recall_is_high(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import (
        _quantized,
        cosine_topk,
        dequantize_col,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    corpus = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(1, 200)]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    qv = [float(x) for x in rng.normal(size=16)]
    exact = [r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()]
    recon = _quantized(df, "vec_id", "embedding").select(
        F.col("id").alias("vec_id"), dequantize_col("qvec", "scale").alias("rvec")
    )
    approx = [r["vec_id"] for r in cosine_topk(recon, qv, k=10, vec_col="rvec").collect()]
    # int8 error is ~0.4% of range: top-10 should survive nearly intact
    assert len(set(exact) & set(approx)) >= 8


def test_embedding_dim_stats_exact(spark):
    from skylinemapreducehadoop_spark.operators.similarity import (
        embedding_dim_stats,
    )

    rows = [
        (1, [1.0, -2.0]),
        (2, [3.0, 0.5]),
        (3, [5.0, 2.5]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n"] == 3 and got[0]["mean"] == 3.0
    assert got[0]["vmin"] == 1.0 and got[0]["vmax"] == 5.0
    import math

    assert abs(got[0]["std"] - math.sqrt(8.0 / 3.0)) < 1e-8
    assert got[1]["mean"] == round(1.0 / 3.0, 9)


def test_gram_matrix_matches_numpy_and_layout(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import gram_matrix

    rng = np.random.RandomState(7)
    X = rng.randn(40, 5).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["gram"] for r in gram_matrix(df).collect()}
    G = X.astype(np.float64).T @ X.astype(np.float64)
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), g in got.items():
        assert i <= j
        assert abs(g - G[i, j]) < 1e-3  # quantization at 1e-6 per value
    # exact layout independence (the decimal-fold contract)
    got2 = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix(df.repartition(11)).collect()
    }
    assert got == got2


def test_covariance_matrix_matches_numpy(spark):
    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import (
        covariance_matrix,
    )

    rng = np.random.RandomState(11)
    X = rng.randn(60, 4).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(df).collect()}
    C = np.cov(X.astype(np.float64).T, bias=True)
    assert len(got) == 10
    for (i, j), c in got.items():
        assert abs(c - C[i, j]) < 1e-3
    got2 = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df.repartition(7)).collect()
    }
    assert got == got2  # exact decimal numerator => layout-exact


# ---------------------------------------------------------------------------
# pca_components / pca_project (round 10)


def test_pca_matches_numpy_eigh(spark):
    import numpy as np
    import pytest
    from skylinemapreducehadoop_spark.operators.similarity import pca_components

    rng = np.random.default_rng(7)
    # anisotropic 6-dim blob: variance concentrated on a known axis
    base = rng.normal(0, 1, (300, 6))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    eigvals, eigvecs, means = pca_components(df)
    # reference on the float32-then-quantized data the engine saw
    q = np.round(base.astype(np.float32).astype(np.float64) * 1e6) / 1e6
    cov = np.cov(q.T, bias=True)
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert eigvals == pytest.approx(ref, abs=1e-6)
    # orthonormal components
    assert np.allclose(eigvecs.T @ eigvecs, np.eye(6), atol=1e-9)
    # sign convention: largest-|loading| coordinate positive
    for c in range(eigvecs.shape[1]):
        assert eigvecs[np.argmax(np.abs(eigvecs[:, c])), c] > 0
    # dominant axis is dim 0
    assert np.argmax(np.abs(eigvecs[:, 0])) == 0


def test_pca_project_variance_equals_eigenvalue(spark):
    import numpy as np
    import pytest
    from skylinemapreducehadoop_spark.operators.similarity import (
        pca_components,
        pca_project,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (200, 4))
    base[:, 2] *= 4.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    eigvals, _, _ = pca_components(df, k=2)
    proj = pca_project(df, k=2, round_digits=9).toPandas()
    for c in range(2):
        v = proj[f"proj_{c}"].to_numpy()
        assert float(np.var(v)) == pytest.approx(float(eigvals[c]), rel=1e-4)
    # components are uncorrelated in projection space
    assert float(np.corrcoef(proj["proj_0"], proj["proj_1"])[0, 1]) == pytest.approx(
        0.0, abs=1e-3
    )


def test_pca_project_is_map_only(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.similarity import pca_project

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 3)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        pca_project(df, k=1)._jdf.queryExecution().executedPlan().toString()
    )
    # the projection itself adds no shuffle: no Exchange in the final
    # projection plan (the covariance pass ran eagerly at build time)
    assert "Exchange" not in plan


def test_pca_components_empty_input_raises_clearly(spark):
    # ADVICE r10 regression: an all-null / empty vector column must
    # raise a clear contract error, not an opaque max()-of-empty
    import pytest
    from skylinemapreducehadoop_spark.operators.similarity import pca_components

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca_components(df)


def test_hard_negatives_matches_bruteforce(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 1, (80, 6))
    labels = [i % 4 for i in range(80)]
    rows = [
        (i, [float(x) for x in vecs[i]], labels[i]) for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(7)  # result must be partitioning-independent
    got = hard_negatives(df, [0, 5], k=3).orderBy("qid", "rank").collect()

    # numpy brute force on the same float32-promoted vectors
    v32 = vecs.astype(np.float32).astype(np.float64)
    norm = np.linalg.norm(v32, axis=1)
    for qid in (0, 5):
        mine = [r for r in got if r["qid"] == qid]
        assert [r["rank"] for r in mine] == [1, 2, 3]
        assert all(r["neg_label"] != labels[qid] for r in mine)
        assert all(r["neg_id"] != qid for r in mine)
        scores = np.round(v32 @ v32[qid] / (norm * norm[qid]), 6)
        cand = [
            (scores[j], j)
            for j in range(80)
            if labels[j] != labels[qid] and j != qid
        ]
        cand.sort(key=lambda t: (-t[0], -t[1]))
        want = [(j, s) for s, j in cand[:3]]
        assert [(r["neg_id"], round(r["score"], 6)) for r in mine] == [
            (j, round(float(s), 6)) for j, s in want
        ]


def test_hard_negatives_corpus_never_shuffles_vectors(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(1)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 4)], i % 3) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    plan = (
        hard_negatives(df, [0], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the anchor slate broadcasts; the only exchanges carry the slim
    # grouped_topk partials, never the embedding column
    assert "BroadcastExchange" in plan
    import re as _re
    shuffles = _re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    assert all("embedding" not in s for s in shuffles)


def test_hard_positives_same_label_only(spark):
    import numpy as np
    from skylinemapreducehadoop_spark.operators.similarity import (
        hard_negatives,
        hard_positives,
    )

    rng = np.random.default_rng(13)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 5)], i % 3) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pos = hard_positives(df, [0, 4], k=3).collect()
    assert {r["qid"] for r in pos} == {0, 4}
    for r in pos:
        assert r["pos_label"] == r["qid"] % 3  # same label as anchor
        assert r["pos_id"] != r["qid"]
    # positives and negatives partition the candidate space: no overlap
    neg = hard_negatives(df, [0, 4], k=3).collect()
    pos_ids = {(r["qid"], r["pos_id"]) for r in pos}
    neg_ids = {(r["qid"], r["neg_id"]) for r in neg}
    assert not pos_ids & neg_ids
