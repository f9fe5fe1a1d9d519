"""BPE encode (the apply half of the tokenizer; train half in
test_kernel-adjacent bpe tests). Property-tests the rank-order replay
against an independent lowest-rank-first implementation, plus the
lossless-roundtrip law and the encode-reproduces-training-symbols law.
"""

from __future__ import annotations

import random

from skylinemapreducehadoop_spark.functions.text import (
    bpe_apply_word,
    bpe_encode,
    bpe_train,
)

EOW = "</w>"


def _rank_order_replay(syms: list[str], pairs: list[tuple[str, str]]) -> list[str]:
    """Independent formulation: replay the table in rank order, merging
    left-to-right non-overlapping — bpe_train's fold semantics. Equal
    to the library's lowest-rank-first loop on any TRAINING-PRODUCED
    table (merged symbols are created by lower ranks than any merge
    consuming them)."""
    syms = list(syms)
    for left, right in pairs:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def _rand_corpus(rng: random.Random, alphabet: str = "abc") -> list[str]:
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(rng.randint(3, 30))
    ]


def test_apply_matches_rank_order_replay_on_trained_shaped_tables():
    rng = random.Random(7)
    for trial in range(60):
        words = _rand_corpus(rng)
        # random merge tables drawn from pairs that actually occur, so
        # merges fire (an arbitrary random table would mostly no-op)
        pairs_seen = sorted(
            {(a, b) for w in words for a, b in zip(list(w) + [EOW], (list(w) + [EOW])[1:])}
        )
        rng.shuffle(pairs_seen)
        table = pairs_seen[: rng.randint(0, min(6, len(pairs_seen)))]
        # synthesize follow-on merges over merged symbols too
        if table:
            lft, r = table[0]
            table.append((lft + r, EOW))
        for w in words:
            a = bpe_apply_word(list(w) + [EOW], table)
            b = _rank_order_replay(list(w) + [EOW], table)
            assert a == b, (trial, w, table, a, b)
            assert "".join(a) == w + EOW  # lossless roundtrip


def test_apply_foreign_table_merges_late_created_operands():
    # a table where the rank-0 merge consumes a symbol only rank 1
    # creates: rank-order replay would silently no-op rank 0; the
    # lowest-rank-first loop (reference tokenizers) applies it once its
    # operands exist
    table = [("a", "bc"), ("b", "c")]
    assert bpe_apply_word(list("abc") + [EOW], table) == ["abc", EOW]
    assert _rank_order_replay(list("abc") + [EOW], table) == ["a", "bc", EOW]


def test_encode_reproduces_training_symbols(spark):
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    text = " ".join(w for w, f in words for _ in range(f))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=8)
    pairs = [(lft, r) for _, lft, r, _ in merges]
    # encoding each training word must reproduce the trainer's final
    # symbol sequence for that word (replay semantics are identical)
    enc = bpe_encode(
        spark.createDataFrame([(w,) for w, _ in words], "text string"),
        merges,
    ).collect()
    by_word = {r["text"]: r["bpe_tokens"] for r in enc}
    for w, _ in words:
        assert by_word[w] == bpe_apply_word(list(w) + [EOW], pairs)
        assert "".join(by_word[w]) == w + EOW


def test_encode_spark_matches_local_and_handles_nulls(spark):
    table = [(0, "l", "o", 9), (1, "lo", "w", 7), (2, "e", "r", 5)]
    df = spark.createDataFrame(
        [(1, "low lower"), (2, None), (3, ""), (4, "xyz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, table).collect()}
    assert rows[1] == ["low", EOW, "low", "er", EOW]
    assert rows[2] is None
    assert rows[3] == []  # "".split() -> no words -> empty token list
    assert rows[4] == ["x", "y", "z", EOW]


def test_encode_is_map_only(spark):
    table = [("l", "o")]
    df = spark.range(10).withColumn("text", __import__("pyspark").sql.functions.lit("lot"))
    plan = bpe_encode(df, table)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_encode_word_boundaries_match_tokens_on_unicode_whitespace(spark):
    """Java \\s+ (tokens()/bpe_train's split) is ASCII-only: NBSP is NOT
    a word boundary there, so encode must keep 'a\\u00a0b' as ONE word —
    Python str.split() would break it in two, diverging from training."""
    from pyspark.sql import functions as F

    from skylinemapreducehadoop_spark.functions.text import tokens

    text = "lo ot lo ot x"  # NBSP inside a word; EM-space too
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    engine_words = df.select(tokens("text").alias("t")).collect()[0]["t"]
    assert engine_words == ["lo ot", "lo", "ot x"]

    enc = bpe_encode(df, [("l", "o")]).collect()[0]["bpe_tokens"]
    # reassembling the encoded stream word-by-word must reproduce the
    # ENGINE's word boundaries exactly
    joined = "".join(enc).split(EOW)
    assert [w for w in joined if w] == engine_words
