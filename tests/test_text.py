"""Text-function tests vs plain-Python references."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.functions import text as TX


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_token_counts(spark):
    texts = ["a b c", "  leading and   inner   spaces ", "one"]
    out = TX.text_stats(_df(spark, texts)).orderBy("doc_id").collect()
    assert [r["n_tokens"] for r in out] == [3, 4, 1]
    assert [r["n_chars_calc"] for r in out] == [len(t) for t in texts]
    assert out[0]["n_distinct_tokens"] == 3
    assert out[1]["n_stopwords"] == 1  # 'and'


def test_stopword_count_exact(spark):
    out = TX.text_stats(_df(spark, ["the cat and the hat", "no stops here"])).orderBy("doc_id").collect()
    assert out[0]["n_stopwords"] == 3  # the, and, the
    assert out[1]["n_stopwords"] == 0


def test_fingerprint_matches_md5(spark):
    texts = ["hello world", "xyz"]
    out = TX.text_stats(_df(spark, texts)).orderBy("doc_id").collect()
    for t, r in zip(texts, out):
        expect = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert r["fingerprint"] == expect


def test_bpe_ish_counts(spark):
    df = _df(spark, ["abc123 def, ghi!", "plain words"])
    out = df.select(TX.bpe_ish_token_count("text").alias("n")).collect()
    # abc|123 + def|, + ghi|! -> 6 pieces ; plain words -> 2
    assert out[0]["n"] == 6
    assert out[1]["n"] == 2


def test_quality_flags(spark):
    good = " ".join(["word"] * 20)
    short = "tiny doc"
    stoppy = " ".join(["the"] * 30)
    out = TX.quality_flags(_df(spark, [good, short, stoppy])).orderBy("doc_id").collect()
    assert out[0]["quality_ok"] is True
    assert out[1]["len_ok"] is False and out[1]["quality_ok"] is False
    assert out[2]["stopword_ok"] is False


def test_language_id(spark):
    df = _df(
        spark,
        [
            "the quick brown fox jumps over the lazy dog and it is fast",
            "der Hund ist nicht ein Tier und das ist gut",
            "el perro es una mascota y los gatos con el",
            "你好世界你好世界你好",
        ],
    )
    out = TX.language_id(df).orderBy("doc_id").collect()
    assert out[0]["lang_pred"] == "en"
    assert out[1]["lang_pred"] == "de"
    assert out[2]["lang_pred"] == "es"
    assert out[3]["lang_pred"] == "zh"


def test_ngrams_matches_python(spark):
    texts = ["a b c d", "x y", "solo", "", "  padded   spaces  here ok "]
    out = {r["doc_id"]: r["g"] for r in _df(spark, texts).select(
        "doc_id", TX.ngrams("text", 2).alias("g")).collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        want = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)] if len(toks) >= 2 else []
        assert out[i] == want, (i, out[i], want)


def test_repetition_stats(spark):
    df = _df(spark, ["a b a b a", "x y z", "solo"])
    out = {r["doc_id"]: r for r in TX.repetition_stats(df).collect()}
    # "a b a b a": bigrams = [a b, b a, a b, b a] -> top count 2;
    # tie between 'a b' and 'b a' breaks to the lexicographically LAST
    assert out[0]["n_grams"] == 4
    assert out[0]["n_distinct_grams"] == 2
    assert out[0]["top_gram_count"] == 2
    assert out[0]["top_gram"] == "b a"
    assert out[1]["n_grams"] == 2 and out[1]["top_gram_count"] == 1
    assert 2 not in out  # <2 tokens -> no gram distribution row


def test_redact_pii(spark):
    df = _df(spark, [
        "mail me at jane.doe+x@mail.example.org thanks",
        "call 555-123-4567 or ping 10.0.0.7 now",
        "nothing sensitive here",
    ])
    out = {r["doc_id"]: r for r in TX.redact_pii(df).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["redacted"]
    assert "jane" not in out[0]["redacted"]
    assert out[1]["n_phone"] == 1 and out[1]["n_ipv4"] == 1
    assert "<PHONE>" in out[1]["redacted"] and "<IPV4>" in out[1]["redacted"]
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ipv4"] == 0
    assert out[2]["redacted"] == "nothing sensitive here"


def test_chunk_documents_windows(spark):
    # 10 tokens, size 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    toks = [f"t{i}" for i in range(10)]
    df = _df(spark, [" ".join(toks)])
    out = TX.chunk_documents(df, size=4, overlap=1).orderBy("chunk_id").collect()
    texts = [r["chunk_text"] for r in out]
    assert texts == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
        "t9",
    ]
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 1]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = _df(spark, ["only two", ""])
    out = TX.chunk_documents(df, size=64, overlap=16).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert len(out) == 2  # one chunk each
    assert by_doc[0]["chunk_text"] == "only two"
    assert by_doc[1]["chunk_text"] == ""


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    df = _df(spark, ["a"])
    with pytest.raises(ValueError):
        TX.chunk_documents(df, size=8, overlap=8)


def test_token_entropy_matches_reference(spark):
    import math
    from collections import Counter

    texts = ["a a a a", "a b c d", "a a b b c", "solo"]
    out = {
        r["doc_id"]: r
        for r in TX.token_entropy(_df(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        counts = Counter(toks)
        n = len(toks)
        want = -sum((c / n) * math.log2(c / n) for c in counts.values())
        got = out[i]["token_entropy"]
        # operator output is rounded to 6 decimals (cross-engine hash)
        assert abs(got - want) < 1e-6, (i, got, want)
        assert out[i]["n_tokens"] == n
        assert out[i]["n_token_types"] == len(counts)
    assert out[0]["token_entropy"] == 0.0  # all-same-token doc
    assert abs(out[1]["token_entropy"] - 2.0) < 1e-6  # 4 uniform tokens


def test_pack_sequences_budget_and_determinism(spark):
    import math

    texts = [f"tok{i} " * (i % 37 + 1) for i in range(200)]
    df = _df(spark, texts)
    out = TX.pack_sequences(df, budget=64, n_shards=4).collect()
    assert len(out) == 200
    rows = sorted(out, key=lambda r: (r["shard"], r["doc_id"]))
    # reference: greedy cumulative packing within each shard
    cum = {}
    for r in rows:
        shard = r["shard"]
        before = cum.get(shard, 0)
        want = shard * (1 << 40) + before // 64
        assert r["pack_id"] == want, (r, before)
        cum[shard] = before + r["n_tokens"]
    # partitioning-independent
    again = TX.pack_sequences(df.repartition(7), budget=64, n_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pack_sequences_rejects_bad_args(spark):
    import pytest

    df = _df(spark, ["a"])
    with pytest.raises(ValueError):
        TX.pack_sequences(df, budget=0)
    with pytest.raises(ValueError):
        TX.pack_sequences(df, n_shards=0)


def test_unigram_logprob_matches_reference(spark):
    import math
    from collections import Counter

    texts = ["a a b", "b c", "a c c d"]
    out = {r["doc_id"]: r for r in TX.unigram_logprob(_df(spark, texts)).collect()}
    corpus = Counter(" ".join(texts).split())
    N = sum(corpus.values())
    for i, t in enumerate(texts):
        toks = t.split()
        want = sum(math.log2(corpus[w] / N) for w in toks) / len(toks)
        got = out[i]["avg_token_logprob"]
        # operator output is rounded to 6 decimals (cross-engine hash)
        assert abs(got - want) < 1e-6, (i, got, want)
        assert out[i]["n_tokens"] == len(toks)


def test_classifier_score_deterministic_and_bounded(spark):
    from skylinemapreducehadoop_spark.functions.text import classifier_score

    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "zzz qqq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in classifier_score(df).collect()}
    # same text -> identical score (content-hashed features, no seed state)
    assert out[0]["score"] == out[1]["score"]
    assert out[0]["prob"] == out[1]["prob"]
    for r in out.values():
        assert -1.0 <= r["score"] <= 1.0
        assert 0.0 < r["prob"] < 1.0
    assert out[0]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    # partitioning independence: integer weight sum is order-free
    rep = {r["doc_id"]: r["score"] for r in classifier_score(df.repartition(7)).collect()}
    assert rep == {k: v["score"] for k, v in out.items()}


def test_bigram_logprob_matches_reference(spark):
    import math
    from collections import Counter

    texts = ["a a b a b", "b c b c", "a c c d e", "x"]
    out = {r["doc_id"]: r for r in TX.bigram_logprob(_df(spark, texts)).collect()}
    bigrams = Counter()
    vocab = set()
    for t in texts:
        ws = t.split()
        vocab |= set(ws)
        bigrams.update(zip(ws, ws[1:]))
    ctx = Counter()
    for (w1, _), c in bigrams.items():
        ctx[w1] += c
    V = len(vocab)
    for i, t in enumerate(texts):
        ws = t.split()
        if len(ws) < 2:
            assert i not in out  # no bigrams -> absent by contract
            continue
        bs = list(zip(ws, ws[1:]))
        want = sum(
            math.log2((bigrams[b] + 1) / (ctx[b[0]] + V)) for b in bs
        ) / len(bs)
        got = out[i]["avg_bigram_logprob"]
        assert abs(got - want) < 1e-6, (i, got, want)
        assert out[i]["n_bigrams"] == len(bs)
    # word salad scores worse than its in-order source under the
    # bigram model even when unigram stats are identical
    ordered = ["the cat sat on the mat", "the cat sat on the mat",
               "the cat sat on the mat", "mat the on sat cat the"]
    o = {r["doc_id"]: r["avg_bigram_logprob"]
         for r in TX.bigram_logprob(_df(spark, ordered)).collect()}
    assert o[3] < o[0]


def test_build_vocab_and_encode(spark):
    from skylinemapreducehadoop_spark.functions.text import build_vocab, encode_tokens

    texts = ["b a a", "a b c", "d d d d c"]
    df = _df(spark, texts)
    vocab = {r["token"]: (r["token_id"], r["count"]) for r in build_vocab(df, max_size=3).collect()}
    # counts: d=4, a=3, b=2, c=2 -> top3 by (count desc, token asc): d, a, b
    assert vocab == {"d": (1, 4), "a": (2, 3), "b": (3, 2)}
    out = {r["doc_id"]: r for r in encode_tokens(df, build_vocab(df, max_size=3)).collect()}
    assert out[0]["token_ids"] == "3-2-2" and out[0]["n_oov"] == 0
    assert out[1]["token_ids"] == "2-3-0" and out[1]["n_oov"] == 1  # c is OOV
    assert out[2]["token_ids"] == "1-1-1-1-0" and out[2]["n_tokens"] == 5
    # determinism under repartitioning
    a = sorted(map(tuple, encode_tokens(df.repartition(7), build_vocab(df, max_size=3)).collect()))
    b = sorted(map(tuple, encode_tokens(df, build_vocab(df.repartition(5), max_size=3)).collect()))
    assert a == b


def test_pmi_collocations_reference(spark):
    import math

    from skylinemapreducehadoop_spark.functions.text import pmi_collocations

    docs = [
        (1, "new york new york city"),
        (2, "new york is a city"),
        (3, "a city in new york"),
        (4, "york new haven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): (r["c12"], r["pmi"])
        for r in pmi_collocations(df, min_count=2, k=10).collect()
    }
    # python reference over the same bigram stream
    bgs = []
    for _, t in docs:
        tk = t.split()
        bgs += list(zip(tk, tk[1:]))
    from collections import Counter

    c12 = Counter(bgs)
    c1 = Counter(a for a, _ in bgs)
    c2 = Counter(b for _, b in bgs)
    n = len(bgs)
    want = {
        p: (c, round((math.log2(c) + math.log2(n)) - (math.log2(c1[p[0]]) + math.log2(c2[p[1]])), 6))
        for p, c in c12.items()
        if c >= 2
    }
    assert out == want
    # 'new york' is the dominant collocation
    assert ("new", "york") in out


def _bpe_ref(word_freq, n_merges, eow="</w>"):
    """Sennrich et al.'s reference BPE on a word-frequency dict."""
    from collections import Counter

    vocab = {tuple(list(w) + [eow]): f for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        stats = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        # max count, ties by (left, right) ascending — the engine's rule
        (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.mark.parametrize("budget", [2_000_000, 0])  # local path / distributed path
def test_bpe_train_matches_reference(spark, budget):
    from collections import Counter

    from skylinemapreducehadoop_spark.functions.text import bpe_train

    docs = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest widest"),
        (4, "widest widest low newest"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wf = Counter(w for _, t in docs for w in t.split())
    want = _bpe_ref(wf, 8)
    got = bpe_train(df, n_merges=8, local_vocab_budget=budget)
    assert got == want
    # the classic example learns 'est'-style units: merged symbols grow
    assert any(len(l + r) >= 3 for _, l, r, _ in got)


@pytest.mark.parametrize("budget", [2_000_000, 0])
def test_bpe_train_overlapping_run_semantics(spark, budget):
    from skylinemapreducehadoop_spark.functions.text import bpe_train

    # 'aaaa': (a,a) counted per adjacent position (3 per word, 2 words
    # -> 6), merged left-to-right non-overlapping -> [aa, aa, </w>];
    # later rounds follow the reference exactly (incl. the '</w>' <
    # 'aa' tiebreak)
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got = bpe_train(df, n_merges=3, local_vocab_budget=budget)
    assert got[0] == (0, "a", "a", 6)
    assert got == _bpe_ref({"aaaa": 2}, 3)


def test_bpe_train_local_deep_merge_budget_is_fast(spark):
    # a realistic merge budget must be driver-CPU seconds, not Spark
    # jobs: 500 merges over the sf0.001 corpus vocabulary, checked
    # against the plain-reference trainer for exactness
    import time
    from collections import Counter

    from skylinemapreducehadoop_spark.functions.text import bpe_train, tokens
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t0 = time.monotonic()
    got = bpe_train(docs, n_merges=500)
    elapsed = time.monotonic() - t0
    # the tiny corpus's vocabulary exhausts before 500 (every word one
    # symbol) — the trainer and the reference must stop at the same rank
    assert len(got) > 50
    assert elapsed < 60, f"deep merge run took {elapsed:.1f}s"
    wf = Counter(
        r["w"]
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .where(F.col("w") != "")
        .collect()
    )
    assert got == _bpe_ref(wf, 500)


def test_tfidf_keywords_matches_reference(spark):
    import math
    from collections import Counter

    from skylinemapreducehadoop_spark.functions.text import tfidf_keywords

    docs = {
        1: "spark shuffle join hash join hash",
        2: "hash table scan filter",
        3: "the quick brown fox the the",
        4: "join join join spark",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    dfreq = Counter(t for v in toks.values() for t in set(v))
    want = {}
    for i, v in toks.items():
        scored = sorted(
            (
                (round(c * (math.log2(n + 1) - math.log2(dfreq[t])), 6), t)
                for t, c in Counter(v).items()
            ),
            key=lambda st: (-st[0], st[1]),
        )[:3]
        want[i] = [(t, r + 1, s) for r, (s, t) in enumerate(scored)]
    got = {}
    for r in tfidf_keywords(df, k=3).collect():
        got.setdefault(r["id"], []).append((r["token"], r["rank"], r["score"]))
    for i in want:
        got[i].sort(key=lambda x: x[1])
        assert got[i] == want[i], i


def test_length_buckets_padding_and_truncation(spark):
    from skylinemapreducehadoop_spark.functions.text import length_buckets

    mk = lambda n: " ".join(["w"] * n)  # noqa: E731
    rows = [(mk(3),), (mk(64),), (mk(65),), (mk(500),), (mk(600),), (None,)]
    df = spark.createDataFrame(rows, "text string")
    got = {r["bucket_cap"]: r for r in length_buckets(df).collect()}
    # 3 and 64 -> cap 64: padding (64-3) + 0
    assert got[64]["n_docs"] == 2 and got[64]["padding_tokens"] == 61
    assert got[64]["truncated_tokens"] == 0
    # 65 -> cap 128: padding 63
    assert got[128]["n_docs"] == 1 and got[128]["padding_tokens"] == 63
    # 500 fits 512 (padding 12); 600 overflows (truncated 88, no padding)
    assert got[512]["n_docs"] == 2
    assert got[512]["padding_tokens"] == 12
    assert got[512]["truncated_tokens"] == 88
    assert sum(r["n_docs"] for r in got.values()) == 5  # NULL text excluded
    import pytest

    with pytest.raises(ValueError):
        length_buckets(df, caps=[])


def test_vocab_coverage_oov_and_determinism(spark):
    from skylinemapreducehadoop_spark.functions.text import vocab_coverage

    rows = [
        (1, "a a a b b c"),   # with vocab_size=2: vocab = {a, b}
        (2, "c c d"),         # all OOV
        (3, ""),              # empty -> 0/0/0.0
        (4, "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in vocab_coverage(df, vocab_size=2).collect()}
    assert got[1]["n_tokens"] == 6 and got[1]["oov_tokens"] == 1  # the c
    assert got[2]["n_tokens"] == 3 and got[2]["oov_tokens"] == 3
    assert got[2]["oov_rate"] == 1.0
    assert got[3]["n_tokens"] == 0 and got[3]["oov_rate"] == 0.0
    assert got[4]["oov_tokens"] == 0
    # boundary tie: c(3) vs b(3)? counts: a=4,b=3,c=3,d=1 -> vocab_size 2
    # picks a then b (count desc, token asc beats c) — asserted via doc 1


def test_vocab_growth_curve(spark):
    from skylinemapreducehadoop_spark.functions.text import vocab_growth

    rows = [
        (1, "a b c"),
        (2, "a b"),
        (3, "d"),
        (4, "a d e f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["k"]: r for r in vocab_growth(df, checkpoints=2).collect()}
    # cutoffs: k=1 -> 2, k=2 -> 4
    assert got[1]["cutoff_id"] == 2 and got[2]["cutoff_id"] == 4
    assert got[1]["n_docs"] == 2 and got[2]["n_docs"] == 4
    assert got[1]["n_tokens"] == 5 and got[2]["n_tokens"] == 10
    assert got[1]["n_vocab"] == 3  # {a,b,c}
    assert got[2]["n_vocab"] == 6  # {a,b,c,d,e,f}
    # monotone by construction; layout independence
    got2 = {
        r["k"]: r["n_vocab"]
        for r in vocab_growth(df.repartition(5), checkpoints=2).collect()
    }
    assert got2 == {k: r["n_vocab"] for k, r in got.items()}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vocab_growth(df, checkpoints=0)


def test_winnow_guarantee_and_degenerate_docs(spark):
    # winnowing's contract: any shared token run of length
    # gram_k + window - 1 (= 6 here) yields at least one shared
    # fingerprint; short docs degrade to one fingerprint; empty to none
    from skylinemapreducehadoop_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, "x y z " + shared + " q r"),
        (2, shared + " completely different tail words here"),
        (3, "one two"),  # 2 tokens -> 0 grams -> no fingerprints
        (4, "one two three four"),  # 2 grams < window -> global min
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnow_fingerprints("text", gram_k=3, window=4).alias("fp")
        ).collect()
    }
    assert got[1] & got[2], "shared 6-token run must share a fingerprint"
    assert got[3] == set()
    assert len(got[4]) == 1
    assert got[5] == set()
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints("text", gram_k=0)


# ---------------------------------------------------------------------------
# vocab_budget (round 10)


def test_vocab_budget_known_corpus(spark):
    import pytest
    from skylinemapreducehadoop_spark.functions.text import vocab_budget

    # 10 'a', 5 'b', 3 'c', 2 'd' -> total 20; ranked a,b,c,d
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 3 + ["d"] * 2)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        r["target_num"]: r
        for r in vocab_budget(
            df, targets=((50, 100), (75, 100), (90, 100), (100, 100))
        ).collect()
    }
    assert out[50]["vocab_size"] == 1 and out[50]["covered_tokens"] == 10
    assert out[75]["vocab_size"] == 2 and out[75]["covered_tokens"] == 15
    assert out[90]["vocab_size"] == 3 and out[90]["covered_tokens"] == 18
    assert out[100]["vocab_size"] == 4 and out[100]["covered_tokens"] == 20
    assert all(r["total_tokens"] == 20 for r in out.values())


def test_vocab_budget_tie_break_deterministic(spark):
    from skylinemapreducehadoop_spark.functions.text import vocab_budget

    # all tokens equal count: ranking breaks by token text, coverage
    # boundaries remain exact
    df = spark.createDataFrame([(1, "z y x w")], "doc_id long, text string")
    out = {r["target_num"]: r for r in vocab_budget(df, targets=((50, 100),)).collect()}
    assert out[50]["vocab_size"] == 2  # 2 of 4 tokens = exactly 50%


def test_normalize_nfc_composes_and_flags(spark):
    from skylinemapreducehadoop_spark.functions.text import normalize_nfc

    dec = "cafe" + chr(0x301)          # e + combining acute
    pre = "caf" + chr(0xE9)            # precomposed e-acute
    rows = [(1, dec), (2, pre), (3, "plain ascii"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_nfc(df).collect()}
    assert out[1]["changed"] is True and out[1]["clean_text"] == pre
    assert out[2]["changed"] is False and out[2]["clean_text"] == pre
    assert out[3]["changed"] is False
    assert out[4]["clean_text"] is None and out[4]["changed"] is False
    # normalized forms now dedup to the same hash
    assert out[1]["clean_text"] == out[2]["clean_text"]


def test_lang_purity_planted_mixed_doc(spark):
    import pytest
    from pyspark.sql import functions as F
    from skylinemapreducehadoop_spark.functions.text import language_id
    from skylinemapreducehadoop_spark.operators.dedup import (
        _aligned_segment_array,
    )

    en = " ".join(["the quick brown fox jumps over the lazy"] * 2)  # 16 toks
    zh = "中文 文本 数据 处理 系统 测试 样本 示例"
    df = spark.createDataFrame(
        [(1, en), (2, en + " " + zh)], "doc_id long, text string"
    )
    segs = df.select(
        "doc_id", F.explode(_aligned_segment_array("text", 8)).alias("seg")
    )
    lid = language_id(segs, "seg", "seg_lang")
    per = {
        (r["doc_id"], r["seg_lang"]): r["cnt"]
        for r in lid.groupBy("doc_id", "seg_lang").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    # pure en doc: every segment en
    assert per.get((1, "en"), 0) == 2 and (1, "zh") not in per
    # mixed doc: the CJK tail segment flips to zh via the byte gate
    assert per.get((2, "zh"), 0) >= 1 and per.get((2, "en"), 0) >= 2


def test_encoding_artifacts_counts(spark):
    from skylinemapreducehadoop_spark.functions.text import encoding_artifacts

    rows = [
        (1, "clean text with no damage at all"),
        (2, "Ã©tÃ© is mojibake"),                      # 2 latin1 only
        (3, "donâ€™t â€œquoteâ€¦ bad Ã©"),              # 3 punct + 1 latin1
        (4, "one replacement � char"),                # 1 repl only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in encoding_artifacts(df).collect()
    }
    assert out[1]["n_artifacts"] == 0 and not out[1]["is_mojibake"]
    assert out[2]["n_latin1"] == 2 and out[2]["n_punct"] == 0
    assert not out[2]["is_mojibake"]  # 2 < flag_min=3
    assert out[3]["n_punct"] == 3 and out[3]["n_latin1"] == 1
    assert out[3]["n_artifacts"] == 4 and out[3]["is_mojibake"]
    assert out[4]["n_repl"] == 1 and out[4]["n_artifacts"] == 1
    # rate: 4 artifacts in len chars, per 10k
    n = out[3]["n_chars"]
    assert out[3]["per_10k"] == round(10000.0 * 4 / n, 9)


def test_encoding_artifacts_map_only_plan(spark):
    from skylinemapreducehadoop_spark.functions.text import encoding_artifacts

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        encoding_artifacts(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # free rider on the scan


def test_corpus_budget_stats_values(spark):
    from skylinemapreducehadoop_spark.functions.text import corpus_budget_stats

    rows = [
        ("en", "the cat sat"),          # 11 chars, 11 bytes, 3 tokens
        ("en", "a b"),                  # 3 chars, 3 bytes, 2 tokens
        ("zh", "中文 文本"),  # 5 chars, 13 bytes, 2 tokens
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in corpus_budget_stats(df).collect()}
    en, zh = out["en"], out["zh"]
    assert (en["n_docs"], en["n_chars"], en["n_bytes"], en["n_tokens"]) == (2, 14, 14, 5)
    assert en["bytes_per_char"] == 1.0
    assert en["chars_per_token"] == round(14 / 5, 9)
    assert (zh["n_docs"], zh["n_chars"], zh["n_bytes"], zh["n_tokens"]) == (1, 5, 13, 2)
    assert zh["bytes_per_char"] == round(13 / 5, 9)  # CJK ~3 bytes/char


def test_fix_mojibake_roundtrip_and_gate(spark):
    from skylinemapreducehadoop_spark.functions.text import fix_mojibake
    from pyspark.sql import functions as F

    rows = [
        (1, "中文 café — “quoted” … emoji 🙂"),
        (2, "plain ascii stays a fixed point"),
        (3, "niño garçon déjà"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    moji = F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1")
    out = df.select(
        "doc_id",
        F.col("text").alias("orig"),
        moji.alias("damaged"),
        fix_mojibake(moji).alias("repaired"),
    ).collect()
    for r in out:
        # inverse law holds for every text, including CJK + astral
        assert r["repaired"] == r["orig"]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["damaged"] == by_id[2]["orig"]  # ASCII fixed point
    assert by_id[1]["damaged"] != by_id[1]["orig"]
    # the documented gate: repairing CLEAN non-Latin-1 text fails fast
    # (MALFORMED_CHARACTER_CODING), never corrupts silently — that's
    # why callers filter on encoding_artifacts first
    import pytest

    with pytest.raises(Exception, match="MALFORMED_CHARACTER_CODING"):
        df.select(fix_mojibake(F.col("text")).alias("r")).collect()


def test_script_mix_shares(spark):
    from skylinemapreducehadoop_spark.functions.text import script_mix

    rows = [
        ("en", "hello world 42"),        # 10 latin, 2 digits, 14 chars
        ("zh", "中文本"),                 # 3 han of 3
        ("ru", "Привет ok"),             # 6 cyr + 2 latin of 9
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in script_mix(df).collect()}
    assert out["en"]["n_chars"] == 14
    assert out["en"]["latin_share"] == round(10 / 14, 9)
    assert out["en"]["digit_share"] == round(2 / 14, 9)
    assert out["zh"]["han_share"] == 1.0 and out["zh"]["latin_share"] == 0.0
    assert out["ru"]["cyrillic_share"] == round(6 / 9, 9)
    assert out["ru"]["latin_share"] == round(2 / 9, 9)


def test_line_stats_fractions(spark):
    from skylinemapreducehadoop_spark.functions.text import line_stats

    doc = "\n".join(
        [
            "- bullet one",
            "a normal line that is long enough",
            "trailing thought...",
            "* bullet two",
            "tiny",
            "ends with unicode ellipsis…",
        ]
    )
    df = spark.createDataFrame(
        [(1, doc), (2, "single line only")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in line_stats(df).collect()}
    r = out[1]
    assert r["n_lines"] == 6
    assert r["bullet_frac"] == round(2 / 6, 9)
    assert r["ellipsis_frac"] == round(2 / 6, 9)
    assert r["short_frac"] == round(1 / 6, 9)  # only 'tiny'
    assert out[2]["n_lines"] == 1 and out[2]["bullet_frac"] == 0.0
