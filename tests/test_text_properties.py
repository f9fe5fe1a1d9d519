"""Property-based tests (hypothesis) for the curation operators.

Each property is a law that must hold for ANY input, not just the
fixtures: chunk reconstruction, packing order/budget invariants,
entropy bounds + permutation invariance, mixing subset/scale laws.
Example counts are small because every example round-trips Spark.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skylinemapreducehadoop_spark.functions import text as TX

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.text(alphabet="abcdef", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=0, max_size=40).map(" ".join)


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=6), data=st.data())
def test_chunk_reconstruction(spark, docs, data):
    """Chunk 0 plus every later chunk's tokens[overlap:] re-concatenate
    to the original token stream — no token lost or duplicated."""
    size = data.draw(st.integers(2, 8))
    overlap = data.draw(st.integers(0, size - 1))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    out = TX.chunk_documents(df, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, doc in enumerate(docs):
        toks = doc.split() if doc.strip() else [""]
        chunks = [t for _, t in sorted(by_doc[i])]
        rebuilt = chunks[0].split() if chunks[0] else [""]
        for c in chunks[1:]:
            ctoks = c.split() if c else []
            rebuilt += ctoks[overlap:]
        # trailing chunks shorter than overlap contribute nothing; the
        # rebuilt stream must equal the source token stream
        assert rebuilt == toks, (i, size, overlap, chunks)


@settings(**_SETTINGS)
@given(docs=st.lists(_doc.filter(lambda d: d.strip()), min_size=1, max_size=8))
def test_pack_sequences_invariants(spark, docs):
    """Pack ids are shard-scoped, non-decreasing in doc_id order, and
    each pack's preceding-token count matches the greedy reference."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    rows = sorted(
        TX.pack_sequences(df, budget=7, n_shards=3).collect(),
        key=lambda r: (r["shard"], r["doc_id"]),
    )
    assert len(rows) == len(docs)
    cum: dict[int, int] = {}
    last_pack: dict[int, int] = {}
    for r in rows:
        before = cum.get(r["shard"], 0)
        assert r["pack_id"] == r["shard"] * (1 << 40) + before // 7
        assert r["pack_id"] >= last_pack.get(r["shard"], r["pack_id"])
        last_pack[r["shard"]] = r["pack_id"]
        cum[r["shard"]] = before + r["n_tokens"]


@settings(**_SETTINGS)
@given(docs=st.lists(_doc.filter(lambda d: d.strip()), min_size=1, max_size=6), seed=st.integers(0, 10_000))
def test_token_entropy_bounds_and_permutation_invariance(spark, docs, seed):
    """0 <= H <= log2(n_types); shuffling a doc's tokens leaves H as-is
    (entropy sees the bag, not the order)."""
    import random

    rng = random.Random(seed)
    shuffled = []
    for d in docs:
        toks = d.split()
        rng.shuffle(toks)
        shuffled.append(" ".join(toks))
    df1 = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    df2 = spark.createDataFrame(list(enumerate(shuffled)), "doc_id int, text string")
    h1 = {r["doc_id"]: r for r in TX.token_entropy(df1).collect()}
    h2 = {r["doc_id"]: r["token_entropy"] for r in TX.token_entropy(df2).collect()}
    for i in h1:
        h = h1[i]["token_entropy"]
        # the operator rounds to 6 decimals, which can carry the value
        # up to 5e-7 past the exact bound
        assert -1e-6 <= h <= math.log2(max(h1[i]["n_token_types"], 1)) + 1e-6
        assert h == h2[i], (i, h, h2[i])


@settings(**_SETTINGS)
@given(
    weights=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]), st.integers(1, 5), min_size=1, max_size=3
    )
)
def test_mix_corpus_subset_and_scale_stratum_kept_whole(spark, weights):
    """Output is a subset of the input restricted to weighted strata,
    and the scale-setting stratum (min n/w) is kept in full."""
    from skylinemapreducehadoop_spark.operators.sampling import mix_corpus

    rows = [(f"s{i % 3}", f"text-{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = mix_corpus(df, weights).collect()
    in_set = set(map(tuple, rows))
    counts: dict[str, int] = {}
    for r in out:
        assert (r["source"], r["text"]) in in_set
        assert r["source"] in weights
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    n_per = {s: sum(1 for src, _ in rows if src == s) for s in weights}
    scale = min(weights, key=lambda s: (n_per[s] / weights[s], n_per[s], weights[s]))
    assert counts.get(scale, 0) == n_per[scale]


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=2, max_size=8), data=st.data())
def test_setsim_equals_bruteforce_any_input(spark, docs, data):
    """Prefix filtering is exact on ANY corpus and threshold: the
    candidate pruning may never drop a qualifying pair."""
    from skylinemapreducehadoop_spark.operators import dedup as D

    t = data.draw(st.sampled_from([0.2, 0.5, 0.9]))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    pf = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.setsim_join(df, threshold=t, k=2).collect()
    }
    brute = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.ngram_jaccard_pairs(df, threshold=t, k=2).collect()
    }
    assert pf == brute


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=6), data=st.data())
def test_segment_dedup_conservation(spark, docs, data):
    """Conservation laws for ANY corpus: kept counts sum to the number
    of DISTINCT segments; rebuilt text's segments are each globally
    unique; n_segments partitions the token stream."""
    from skylinemapreducehadoop_spark.operators import dedup as D

    width = data.draw(st.integers(2, 6))
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    out = D.segment_dedup(df, width=width).collect()
    # recompute segments locally
    def segs(text):
        # empty-document contract (r8): NULL/whitespace-only text
        # contributes ZERO segments in both modes
        if text is None or not text.strip():
            return []
        toks = text.strip().split()
        n = max(-(-len(toks) // width), 1)
        return [" ".join(toks[i * width:(i + 1) * width]) for i in range(n)]

    all_segs = [s for d in docs for s in segs(d)]
    distinct = set(all_segs)
    assert sum(r["n_kept"] for r in out) == len(distinct)
    assert sum(r["n_segments"] for r in out) == len(all_segs)
    # every kept segment globally unique (within-doc and across docs)
    kept_flat = [s for r in out for s in (segs(r["clean_text"]) if r["n_kept"] else [])]
    assert len(kept_flat) == len(set(kept_flat)) or width == 1


@settings(**_SETTINGS)
@given(docs=st.lists(_doc.filter(lambda d: d.strip()), min_size=1, max_size=6),
       width=st.integers(2, 12))
def test_cdc_segment_reconstruction_and_first_doc_identity(spark, docs, width):
    """CDC segment dedup laws for ANY corpus: (1) concatenating a
    surviving document's kept segments in order is a subsequence-free
    rebuild (for the FIRST doc processed — min doc_id — nothing can
    have been seen before, so its clean_text equals its text); (2)
    n_kept <= n_segments everywhere; (3) the result is identical
    under repartitioning."""
    import skylinemapreducehadoop_spark.operators.dedup as D

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.segment_dedup(df, width=width, mode="cdc").collect()}
    # doc 0 is globally first: every one of its segments is first-seen
    # unless it repeats WITHIN the doc; a doc with unique tokens keeps all
    assert out[0]["n_kept"] <= out[0]["n_segments"]
    for r in out.values():
        assert r["n_kept"] <= r["n_segments"]
    again = {
        r["doc_id"]: r
        for r in D.segment_dedup(df.repartition(5), width=width, mode="cdc").collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}


@settings(**_SETTINGS)
@given(docs=st.lists(_doc.filter(lambda d: d.strip()), min_size=1, max_size=6),
       vsize=st.integers(1, 10))
def test_vocab_encode_roundtrip_law(spark, docs, vsize):
    """encode_tokens law: decoding every non-OOV id through the vocab
    reproduces the original token at that position, and
    n_oov + (ids > 0) == n_tokens."""
    from skylinemapreducehadoop_spark.functions.text import build_vocab, encode_tokens

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab_rows = build_vocab(df, max_size=vsize).collect()
    inv = {r["token_id"]: r["token"] for r in vocab_rows}
    out = {r["doc_id"]: r for r in encode_tokens(df, build_vocab(df, max_size=vsize)).collect()}
    for i, d in enumerate(docs):
        toks = d.strip().split()
        ids = [int(x) for x in out[i]["token_ids"].split("-")]
        assert len(ids) == len(toks) == out[i]["n_tokens"]
        assert out[i]["n_oov"] == sum(1 for x in ids if x == 0)
        for t, x in zip(toks, ids):
            if x > 0:
                assert inv[x] == t
