"""Text-function tests vs plain-Python references."""

from __future__ import annotations

import hashlib

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
