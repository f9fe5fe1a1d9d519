"""Ranked text retrieval (BM25) over a distributed corpus.

The classic Okapi BM25 scorer (Robertson & Zaragoza, "The
Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009),
re-expressed as the Spark plan a 100 TB corpus needs:

- the per-document token counting is ONE explode + hash aggregate
  (map-side combined); only tokens matching the query survive past
  the filter, so the shuffle carries |docs containing a query term| x
  |query| rows, never the corpus vocabulary;
- document frequencies for the handful of query terms are a
  |query|-row aggregate, broadcast back;
- document lengths are a second narrow aggregate joined on doc id
  (data-sized side — shuffle_hash-pinned, never broadcast);
- the final top-k is ``orderBy(...).limit(k)`` = TakeOrdered, a
  per-partition heap + driver merge of k rows, never a global sort.

Engine-exactness (the repo's LM-scorer rules): both log2 arguments
are INTEGERS — idf = log2(2N+2) − log2(2·df+1), the Lucene-style
non-negative variant expressed in log2 — the tf normalization is a
fixed sequence of IEEE +,*,/ on integer-valued doubles, per-document
contributions are summed by an ascending SORTED FOLD, and the score
is rounded to 6 digits at the libm edge. Ranking compares the
ROUNDED score (ties broken by id) so rank order is also engine-exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.
    Returns (id, n_terms_hit, score) ordered by rounded score desc,
    id asc. Duplicate query terms are collapsed (set semantics).
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    dl = tok.groupBy("id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    tf = (
        tok.where(F.col("tok").isin(terms))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl.hint("shuffle_hash"), "id")
        .crossJoin(F.broadcast(corpus))
    )
    return _bm25_score_topk(scored, k, k1, b)


def _bm25_score_topk(scored: DataFrame, k: int, k1: float, b: float) -> DataFrame:
    """Shared BM25 scoring tail over a frame with columns
    (id, tok, tf, df_t, dl, n_docs, total_tokens) — used by both the
    direct :func:`bm25_topk` and the index-backed :func:`bm25_probe`,
    so the two access paths are row-for-row identical."""
    idf = F.log2((F.lit(2) * F.col("n_docs") + F.lit(2)).cast("double")) - F.log2(
        (F.lit(2) * F.col("df_t") + F.lit(1)).cast("double")
    )
    # avgdl division deferred: dl/avgdl = dl * n_docs / total_tokens,
    # evaluated in exactly this order on integer-valued doubles
    tfn = (F.col("tf").cast("double") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b)
            * (
                F.col("dl").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("total_tokens").cast("double")
            )
        )
    )
    per_doc = (
        scored.select("id", (idf * tfn).alias("__contrib"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sort_array(F.collect_list("__contrib")).alias("__cs"),
        )
        .select(
            "id",
            "n_terms_hit",
            F.round(
                F.aggregate("__cs", F.lit(0.0), lambda acc, c: acc + c), 6
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def build_text_index(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Persist an inverted index for :func:`bm25_probe`: posting lists
    (token, id, tf) parquet-partitioned by ``pmod(hash(token),
    n_buckets)`` — a probe for q terms scans at most q partitions'
    directories and skips the rest at PLAN time (PartitionFilters) —
    plus the doc-length table and the 1-row corpus stats.

    Build-once / probe-many, the same lifecycle as the IVF vector
    index (``similarity.ivf_write``): the expensive corpus pass runs
    once; each query is then a partition-pruned scan + one doc-sized
    equi-join. Stats are written BEFORE postings, so readers gating on
    ``postings/_SUCCESS`` (the last artifact) never see a torn index.
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    dl = tok.groupBy("id").agg(F.count("*").alias("dl"))
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.lit(n_buckets).alias("n_buckets"),
    ).write.mode("overwrite").parquet(f"{path}/stats")
    dl.write.mode("overwrite").parquet(f"{path}/doclens")
    postings = (
        tok.groupBy("tok", "id")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", F.pmod(F.hash("tok"), F.lit(n_buckets)))
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/postings")


def bm25_probe(
    spark,
    path: str,
    query_terms: Sequence[str],
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 top-k against a :func:`build_text_index` index. Score math
    is IDENTICAL to :func:`bm25_topk` (same engine-exactness rules), so
    probe(index(df)) ≡ bm25_topk(df) row-for-row; only the access path
    changes — the corpus is never re-tokenized, and the posting scan
    touches only the query terms' hash buckets.

    ``n_buckets`` is read back from the index's stats (written at build
    time), so a probe can never prune with the wrong modulus; the
    explicit parameter exists only for pre-``n_buckets``-column indexes.
    Bucket ids for the query terms are computed by the ENGINE's own
    ``pmod(hash(tok), n_buckets)`` expression on a |terms|-row local
    frame — the same expression the build partitioned by — so there is
    no driver-side hash reimplementation that could silently drift and
    prune to an empty bucket.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    postings = spark.read.parquet(f"{path}/postings")
    stats = spark.read.parquet(f"{path}/stats")
    if n_buckets is None:
        if "n_buckets" not in stats.columns:
            raise ValueError(
                "index stats carry no n_buckets column (pre-upgrade index); "
                "pass n_buckets= explicitly, matching the build"
            )
        n_buckets = stats.select("n_buckets").first()[0]
    # bucket pruning first (partition filter), then the exact term match;
    # bucket ids come from the same engine expression as the build
    term_df = spark.createDataFrame([(t,) for t in terms], "tok string")
    buckets = sorted(
        {
            r["b"]
            for r in term_df.select(
                F.pmod(F.hash("tok"), F.lit(n_buckets)).alias("b")
            ).collect()
        }
    )
    tf = postings.where(
        F.col("bucket").isin(buckets) & F.col("tok").isin(terms)
    ).select("id", "tok", "tf")
    dl = spark.read.parquet(f"{path}/doclens")
    corpus = stats.select("n_docs", "total_tokens")
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl.hint("shuffle_hash"), "id")
        .crossJoin(F.broadcast(corpus))
    )
    return _bm25_score_topk(scored, k, k1, b)


def rrf_fuse(
    ranked: "Sequence[DataFrame]",
    *,
    id_col: str = "id",
    rank_col: str = "rn",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists: score(d) = sum over lists of 1/(k0 + rank_d). The standard
    way to combine lexical (BM25) and dense (embedding) retrieval —
    rank-based, so the lists' incomparable score scales never matter.

    Each input frame carries (id_col, rank_col) with rank 1-based; a
    document absent from a list contributes nothing for it (the usual
    RRF convention). Returns (id, n_lists, rrf_score) with the score
    summed by ascending sorted fold (deterministic at any N) and
    rounded to 6 — engine-exact, same discipline as the BM25 tail.

    Scale shape: candidate lists are top-k frames (bounded); the union
    + groupBy touches at most sum(k) rows.
    """
    if not ranked:
        raise ValueError("ranked must be non-empty")
    contribs = [
        df.select(
            F.col(id_col).alias("id"),
            (
                F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))
            ).alias("__c"),
        )
        for df in ranked
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sort_array(F.collect_list("__c")).alias("__cs"),
        )
        .select(
            "id",
            "n_lists",
            F.round(
                F.aggregate("__cs", F.lit(0.0), lambda a, c: a + c), 6
            ).alias("rrf_score"),
        )
    )


def retrieval_ndcg(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """nDCG@k of the BM25 ranking against graded term-coverage
    relevance — the standard ranking-quality number for a retrieval
    stack (the evaluation sibling of :func:`bm25_topk`, next to the
    classifier-side ROC-AUC / calibration entries). Relevance grade =
    number of DISTINCT query terms a document contains (idf- and
    length-free), so the metric answers "how much does BM25's
    idf/length weighting re-order pure term coverage":

    - DCG  = sum over the BM25 top-k of (2^rel_i - 1) / log2(pos_i+1)
    - IDCG = the same sum over the corpus-wide ideal (top-k by rel) —
      tie order within a grade cannot change the value
    - nDCG = DCG / IDCG

    Engine-exactness: every position term is rounded to 6 decimals
    (the repo's established log2 tolerance, same as the BM25 score
    itself) and summed in DECIMAL — order-free, so any engine or
    layout produces the identical sum. Both rank windows run over
    LIMIT-k-bounded frames (the documented acceptable unpartitioned-
    window case); the corpus-wide passes are the BM25 scan and one
    (id, matched-terms) aggregate. Returns one row:
    (k, n_ranked, dcg, idcg, ndcg).
    """
    from pyspark.sql import Window

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")

    def _dcg(frame: DataFrame, rel_col: str, out: str) -> DataFrame:
        # frame is k-row bounded by construction
        term = F.round(
            (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0))
            / F.log2(F.col("pos").cast("double") + F.lit(1.0)),
            6,
        )
        return frame.agg(
            F.sum(term.cast("decimal(38,6)")).alias(out),
            F.count(F.lit(1)).alias(f"__n_{out}"),
        )

    top = bm25_topk(
        df, terms, k=k, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    w_top = Window.orderBy(F.col("score").desc(), F.col("id"))
    ranked = top.withColumn("pos", F.row_number().over(w_top))
    dcg = _dcg(ranked, "n_terms_hit", "__dcg")

    rel = (
        df.select(
            F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
        )
        .where(F.col("tok").isin(terms))
        .groupBy("id")
        .agg(F.countDistinct("tok").alias("rel"))
    )
    ideal_k = rel.orderBy(F.col("rel").desc(), F.col("id")).limit(k)
    w_ideal = Window.orderBy(F.col("rel").desc(), F.col("id"))
    ideal = ideal_k.withColumn("pos", F.row_number().over(w_ideal))
    idcg = _dcg(ideal, "rel", "__idcg")

    return dcg.crossJoin(idcg).select(
        F.lit(k).alias("k"),
        F.col("__n___dcg").cast("long").alias("n_ranked"),
        F.round(F.col("__dcg").cast("double"), 6).alias("dcg"),
        F.round(F.col("__idcg").cast("double"), 6).alias("idcg"),
        F.round(
            F.col("__dcg").cast("double") / F.col("__idcg").cast("double"), 6
        ).alias("ndcg"),
    )
