"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine↔oracle parity rules used throughout (so value hashes match):
- every computed column is aliased identically on both sides;
- money-like aggregates go through ``decimal`` casts (exact, engine
  independent) instead of double sums (order-dependent ulps);
- ratio outputs are int/int IEEE divisions (exact) or round(x, 6);
- text hashing is md5-based (identical bytes → identical hex in both).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skylinemapreducehadoop_spark.sources.tables import load_table
from skylinemapreducehadoop_spark.operators.skyline import (
    skyline,
    skyline_by,
    skyline_layers,
)
from skylinemapreducehadoop_spark.operators import dedup as D
from skylinemapreducehadoop_spark.operators import similarity as S
from skylinemapreducehadoop_spark.functions.profile import (
    equidepth_histogram,
    histogram,
    profile,
)
from skylinemapreducehadoop_spark.operators import sketches as SKC
from skylinemapreducehadoop_spark.functions import text as TX
from skylinemapreducehadoop_spark.functions import canary as CN

# ---------------------------------------------------------------------------
# flagship

_DIMS3 = [("l_extendedprice", "min"), ("l_discount", "min"), ("l_quantity", "max")]
_SKY_COLS = ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"]
_BANNER = "subscribe to our newsletter click here for more"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-dim mixed-direction skyline of lineitem at sf0.001."""
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return skyline(li, _DIMS3).select(*_SKY_COLS)


# ---------------------------------------------------------------------------
# query registry


def _sky(strategy: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return skyline(li, _DIMS3, strategy=strategy).select(*_SKY_COLS)

    return q


def _sky_kband_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-skyband over events: rows with fewer than 3 dominators — the
    # slack-tolerant skyline relaxation
    from skylinemapreducehadoop_spark.operators.skyline import skyline_kband

    ev = load_table(spark, sf_dir, "events")
    return skyline_kband(ev, [("value", "max"), ("ts", "min")], k=3).select(
        "event_id", "ts", "value"
    )


def _sky_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed blocked merge (no single-partition stage anywhere);
    # same logical query as skyline_twophase, so it shares that oracle
    li = load_table(spark, sf_dir, "lineitem")
    return skyline(li, _DIMS3, merge="blocked").select(*_SKY_COLS)


def _sky_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dims = [("l_extendedprice", "min"), ("l_quantity", "max")]
    return skyline_by(li, "l_returnflag", dims).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )


def _sky_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SURVEY §7 M3: skyline OVER a join, per group — composition the
    # reference's fixed pipeline cannot express (skyline of
    # lineitem ⋈ orders within each order priority)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # no broadcast hint: orders is itself fact-sized at scale — let AQE
    # pick (it auto-broadcasts at test SFs anyway)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    dims = [("l_extendedprice", "min"), ("l_quantity", "max")]
    return skyline_by(joined, "o_orderpriority", dims)


def _sky_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(*_SKY_COLS)
    return skyline_layers(li, _DIMS3, n_layers=3)


_DIMS5 = [
    ("l_extendedprice", "min"),
    ("l_discount", "min"),
    ("l_quantity", "max"),
    ("l_tax", "min"),
    ("l_shipdate", "max"),
]


def _sky_5dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # closest synthetic analogue of the reference's 9-dim mixed-direction
    # GSOD flagship (4 maximized / 5 minimized, Skyline.java:25-31):
    # 5 dims, 2 maximized, one temporal
    li = load_table(spark, sf_dir, "lineitem")
    return skyline(li, _DIMS5).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
        "l_quantity", "l_tax", "l_shipdate",
    )


def _sky_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return skyline(ev, [("value", "max"), ("ts", "min")]).select("event_id", "ts", "value")


#: deterministic fixed-width GSOD sample shared by the Spark query and
#: the DuckDB oracle (content depends only on n_rows/seed)
_GSOD_FIXTURE = "/tmp/gsod_9dim_fixture.txt"


def _sky_gsod_9dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL flagship: 9-dim mixed-direction skyline
    over fixed-width GSOD text (/root/reference/Skyline.java:25-31),
    end-to-end through read_gsod (header/blank filtering, sentinel→NULL)."""
    from skylinemapreducehadoop_spark.sources.gsod import (
        GSOD_SKYLINE_DIMS,
        make_gsod_fixture,
        read_gsod,
    )

    path = make_gsod_fixture(_GSOD_FIXTURE)
    return skyline(read_gsod(spark, path), GSOD_SKYLINE_DIMS)


def _gsod_oracle() -> str:
    # re-parse the same fixed-width bytes in SQL, then NOT EXISTS
    # dominance with the reference's directions (temp/dewp/slp/max_temp
    # MAX; stp/wdsp/mxspd/gust/min_temp MIN). Ensure the fixture exists
    # even if the oracle is executed before the Spark query (pure-python
    # deterministic generation, no Spark needed).
    from skylinemapreducehadoop_spark.sources.gsod import make_gsod_fixture

    make_gsod_fixture(_GSOD_FIXTURE)
    return f"""
WITH raw AS (
  SELECT line FROM read_csv('{_GSOD_FIXTURE}', header=false, delim='\x01',
                            quote='', columns={{'line':'VARCHAR'}})
),
parsed AS (
  SELECT try_cast(trim(substr(line, 1, 6)) AS INTEGER) AS stn,
         try_cast(trim(substr(line, 15, 8)) AS INTEGER) AS obs_date,
         nullif(try_cast(trim(substr(line, 25, 6)) AS DOUBLE), 9999.9) AS temp,
         nullif(try_cast(trim(substr(line, 36, 6)) AS DOUBLE), 9999.9) AS dewp,
         nullif(try_cast(trim(substr(line, 47, 6)) AS DOUBLE), 9999.9) AS slp,
         nullif(try_cast(trim(substr(line, 103, 6)) AS DOUBLE), 9999.9) AS max_temp,
         nullif(try_cast(trim(substr(line, 58, 6)) AS DOUBLE), 9999.9) AS stp,
         nullif(try_cast(trim(substr(line, 79, 5)) AS DOUBLE), 999.9) AS wdsp,
         nullif(try_cast(trim(substr(line, 89, 5)) AS DOUBLE), 999.9) AS mxspd,
         nullif(try_cast(trim(substr(line, 96, 5)) AS DOUBLE), 999.9) AS gust,
         nullif(try_cast(trim(substr(line, 111, 6)) AS DOUBLE), 9999.9) AS min_temp
  FROM raw
  WHERE trim(coalesce(line, '')) <> '' AND NOT starts_with(line, 'STN---')
),
pts AS (
  SELECT * FROM parsed
  WHERE temp IS NOT NULL AND dewp IS NOT NULL AND slp IS NOT NULL
    AND max_temp IS NOT NULL AND stp IS NOT NULL AND wdsp IS NOT NULL
    AND mxspd IS NOT NULL AND gust IS NOT NULL AND min_temp IS NOT NULL
)
SELECT * FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.temp >= a.temp AND b.dewp >= a.dewp AND b.slp >= a.slp
    AND b.max_temp >= a.max_temp AND b.stp <= a.stp AND b.wdsp <= a.wdsp
    AND b.mxspd <= a.mxspd AND b.gust <= a.gust AND b.min_temp <= a.min_temp
    AND (b.temp > a.temp OR b.dewp > a.dewp OR b.slp > a.slp
         OR b.max_temp > a.max_temp OR b.stp < a.stp OR b.wdsp < a.wdsp
         OR b.mxspd < a.mxspd OR b.gust < a.gust OR b.min_temp < a.min_temp)
)
"""


def _reverse_skyline_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the one operator in the reference paper's title ("skyline and
    # reverse skyline") that the reference repo itself never implements
    # (/root/reference/Readme.md:3-4): rows whose dynamic skyline
    # contains the query point (960.0 price, size 20)
    from skylinemapreducehadoop_spark.operators.reverse import reverse_skyline

    part = load_table(spark, sf_dir, "part")
    return reverse_skyline(part, ["p_retailprice", "p_size"], (960.0, 20.0)).select(
        "p_partkey", "p_retailprice", "p_size"
    )


def _reverse_skyline_oracle() -> str:
    return """
WITH pts AS (
  SELECT p_partkey, p_retailprice, p_size FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
SELECT p_partkey, p_retailprice, p_size FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts t
  WHERE abs(t.p_retailprice - p.p_retailprice) <= abs(960.0 - p.p_retailprice)
    AND abs(t.p_size - p.p_size) <= abs(20.0 - p.p_size)
    AND (abs(t.p_retailprice - p.p_retailprice) < abs(960.0 - p.p_retailprice)
         OR abs(t.p_size - p.p_size) < abs(20.0 - p.p_size))
    AND (t.p_retailprice <> p.p_retailprice OR t.p_size <> p.p_size))
"""


def _profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return profile(li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def _q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,2)")).cast("double").alias("sum_base_price"),
            F.sum(F.col("l_discount").cast("decimal(20,4)")).cast("double").alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _join_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double").alias("revenue"),
        )
    )


def _window_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").start.alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
    )


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.text_stats(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "n_distinct_tokens", "n_stopwords", "fingerprint"
    )


def _fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.rolling_fingerprint("text").alias("roll_fp"))


def _quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.quality_flags(docs)


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # heuristic scorer; exactly mirrored in SQL by _lang_id_oracle
    # (token-equality counting replaces the lookaround regex)
    docs = load_table(spark, sf_dir, "documents")
    return TX.language_id(docs).select("doc_id", "lang_pred")


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs)


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dup(docs, threshold=0.5)


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs).withColumnRenamed("id", "doc_id")


def _ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.5)


def _setsim_join_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT prefix-filtered set-similarity join (AllPairs/PPJoin):
    # same contract as ngram_jaccard_documents' all-pairs twin, but
    # the scale plan — candidates come from an equi-join on rare
    # prefix tokens, never a cartesian. Shares the brute-force oracle.
    docs = load_table(spark, sf_dir, "documents")
    return D.setsim_join(docs, threshold=0.5, k=3)


def _empty_doc_rows(spark: SparkSession) -> DataFrame:
    # planted empty/NULL/whitespace-only docs: the segment-dedup
    # empty-document contract says these survive as (id, '', 0, 0) in
    # BOTH modes (cdc used to drop them; aligned used to emit a fake
    # '' segment)
    return spark.createDataFrame(
        [(600000, ""), (600001, None), (600002, "   ")],
        "doc_id long, text string",
    )


def _segment_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sub-document exact dedup (Lee et al. ACL'22 shape): fixed-width
    # token segments, keep the globally-first occurrence, rebuild docs;
    # plus planted empty/NULL-text rows exercising the empty-doc contract
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.segment_dedup(docs.unionByName(_empty_doc_rows(spark)), width=10)


def _segment_dedup_shifted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shift-robust sub-document dedup (content-defined chunking): the
    # corpus plus planted +1-token-offset copies of every 20th doc
    # ("zz " prefix, doc_id+500000) — a duplicate the ALIGNED mode
    # provably misses (tests prove it) and this mode must catch; the
    # oracle reproduces the md5-anchor boundaries exactly. Planted
    # empty/NULL-text rows exercise the empty-doc contract.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit("zz "), F.col("text")).alias("text"),
    )
    return D.segment_dedup(
        docs.unionByName(shifted).unionByName(_empty_doc_rows(spark)),
        width=10,
        mode="cdc",
    )


def _heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Misra-Gries candidates + exact recount: deterministic output
    # (every token with freq >= ceil(2% of corpus) and its exact
    # count) while the shuffle never carries the vocabulary
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(TX.tokens("text")).alias("tok"))
    return SKC.heavy_hitters(tok, "tok", threshold_ratio=0.02)


def _classifier_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashing-trick linear-model scoring (quality-classifier pass);
    # integer weights keep the fold order-free, sigmoid rounded per
    # the libm rule
    docs = load_table(spark, sf_dir, "documents")
    return TX.classifier_score(docs)


def _histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equi-width profiling histogram; width 50000 is exactly
    # representable so bucketing is bit-identical across engines
    orders = load_table(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", lo=0.0, hi=600000.0, nbins=12)


def _query_vec(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") == 0).select("embedding").first()[0]


def _topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    top = S.cosine_topk(emb.where(F.col("vec_id") != 0), qv, k=10)
    return top.select("vec_id", F.round("score", 6).alias("score"))


def _ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (VERDICT task 5): converted from a rows-only row to a REAL
    # oracle pair — the corpus is the planted-neighbor fixture
    # (_ann_recall_corpus: 10 exact copies of the query vector), so
    # the exact top-10 is provably the planted set and the ANN result
    # list (vec_id, score) — not just its recall count — is
    # deterministic and SQL-derivable (exact brute-force cosine top-k
    # over the same corpus).
    corpus = _ann_recall_corpus(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    top = S.ann_lsh_topk(corpus, qv, k=10)
    return top.select(
        "vec_id", F.round("score", 6).alias("score")
    ).orderBy("vec_id")


def _ivf_cached_index(spark: SparkSession, sf_dir: str, corpus: DataFrame, variant: str):
    """Build-once / probe-many IVF index for a corpus derived
    deterministically from ``sf_dir``'s embeddings: the index
    (assignment partition column + centroids) is persisted on first
    use; later probes are partition-pruned parquet scans with no
    full-data UDF stage. The cache key = source file (mtime, size)
    fingerprint + the ``variant`` tag (natural corpus vs the planted
    recall fixture build DIFFERENT indexes from the same source file),
    so regenerated testdata at the same path rebuilds instead of
    probing a stale index; ivf_write persists centroids BEFORE
    vectors, so the vectors/_SUCCESS gate implies a complete index."""
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nofp"
    tag = hashlib.md5(f"{sf_dir}|{fp}|{variant}".encode()).hexdigest()[:10]
    idx_path = os.path.join(tempfile.gettempdir(), f"ivf_index_{tag}")
    if not os.path.exists(os.path.join(idx_path, "vectors", "_SUCCESS")):
        assigned, C = S.ivf_build(corpus)
        S.ivf_write(assigned, C, idx_path)
    return S.ivf_read(spark, idx_path)


def _ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (VERDICT task 5): same conversion as _ann_lsh_topk — the
    # planted-corpus IVF probe's top-10 result list is deterministic
    # (identical vectors share the query's nearest centroid) and
    # checked against the exact brute-force top-k oracle.
    corpus = _ann_recall_corpus(spark, sf_dir)
    assigned, C = _ivf_cached_index(spark, sf_dir, corpus, "planted10")
    qv = _query_vec(spark, sf_dir)
    top = S.ivf_probe(assigned, C, qv, k=10)
    return top.select(
        "vec_id", F.round("score", 6).alias("score")
    ).orderBy("vec_id")


def _ann_recall_corpus(spark: SparkSession, sf_dir: str, n_plant: int = 10):
    """Planted-neighbor ANN fixture: the base embeddings (max natural
    pairwise cosine ~0.51) plus ``n_plant`` exact copies of the query
    vector (vec_id 0) at ids 900000+. The exact top-10 is therefore
    provably the planted set (cosine 1.0), and a CORRECT ANN index
    must place every planted copy in a probed bucket/cell (identical
    vector -> identical LSH signs / same nearest IVF centroid), so
    recall@10 == 10 is a deterministic, hashable integer — this is
    how the approximate operators get a REAL oracle row instead of
    the r6 rows-only declaration."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = (
        emb.where(F.col("vec_id") == 0)
        .crossJoin(spark.range(n_plant))
        .select((F.lit(900000) + F.col("id")).alias("vec_id"), "embedding")
    )
    return emb.where(F.col("vec_id") != 0).unionByName(planted)


def _ann_recall(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    corpus = _ann_recall_corpus(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    if kind == "lsh":
        ann = S.ann_lsh_topk(corpus, qv, k=10)
    else:
        # the planted fixture is deterministic, so its IVF index is
        # cached under its own fingerprint (variant tag) instead of
        # rebuilt per run — same build-once/probe-many path as the
        # natural-corpus query
        assigned, C = _ivf_cached_index(spark, sf_dir, corpus, "planted10")
        ann = S.ivf_probe(assigned, C, qv, k=10)
    exact = S.cosine_topk(corpus, qv, k=10)
    hits = ann.join(exact.select("vec_id"), "vec_id", "left_semi")
    return hits.agg(F.count("*").cast("int").alias("recall_hits")).select(
        F.lit(10).cast("int").alias("k"), "recall_hits"
    )


def _ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_recall(spark, sf_dir, "lsh")


def _ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_recall(spark, sf_dir, "ivf")


def _embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic embeddings have max natural pairwise cosine ~0.51, so
    # a 0.9-threshold check over the raw table is vacuous (0 == 0). Plant
    # 25 exact duplicates (same vector, shifted id): identical directions
    # share every LSH bucket, so recall is exactly 1.0 and the green row
    # actually exercises the bucket-join + verify path.
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    pairs = S.embedding_near_dup(emb.unionByName(planted), threshold=0.9)
    return pairs.select("id_a", "id_b", F.round("score", 6).alias("score"))


def _semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup end-to-end over the same planted-duplicate setup as
    # embedding_near_dup: pairs -> star components -> keep min-id
    # representative; survivors = everything except the 25 planted
    # shifted-id copies (each pair's higher id drops)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    out = S.embedding_cluster_dedup(emb.unionByName(planted), threshold=0.9)
    return out.select("vec_id")


def _multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # binary-column plumbing demo: text bytes stand in for an opaque
    # media payload; real decode stubs live in operators/multimodal.py
    docs = load_table(spark, sf_dir, "documents")
    bin_col = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.upper(F.substring(F.hex(bin_col), 1, 8)).alias("header_hex"),
        F.ascii(F.substring("text", 1, 1)).cast("int").alias("first_byte"),
    )


def _encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize-and-numericalize against the corpus's own top-2000
    # vocabulary (deterministic count-desc/token-asc ids, OOV=0) — the
    # final prep step before training shards; ids emitted as a joined
    # string so the row hashes across engines
    docs = load_table(spark, sf_dir, "documents")
    vocab = TX.build_vocab(docs, max_size=2000)
    return TX.encode_tokens(docs, vocab)


def _data_quality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Great-Expectations-style table validation compiled to ONE
    # single-pass aggregate (plan-asserted in tests): 6 rules over
    # orders, exact integer metrics -> deterministic hash
    from skylinemapreducehadoop_spark.functions.expect import (
        accepted_values,
        expectations,
        in_range,
        matches,
        min_rows,
        not_null,
        unique,
    )

    orders = load_table(spark, sf_dir, "orders")
    return expectations(
        orders,
        [
            min_rows(100),
            unique("o_orderkey"),
            not_null("o_custkey"),
            in_range("o_totalprice", 0.0, 600000.0),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            matches("o_orderpriority", "^[1-5]-"),
        ],
    )


def _image_header_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL media bytes end-to-end without any codec library: build a
    # valid PNG/GIF/BMP/WAV per document (stdlib struct/zlib, kind and
    # dims/sample-rate derived from doc_id) and read the fields BACK
    # with the zero-UDF JVM header parser. The oracle derives the
    # expected values from doc_id directly, so any corruption in
    # either the writer or the parser breaks the hash — genuine format
    # decoding executes in-sandbox across all four JVM branches (the
    # Pillow codec path stays gated on the library).
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_header_meta,
        synthesize_media_column,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(
            F.array(
                F.lit("png"), F.lit("gif"), F.lit("bmp"), F.lit("jpeg"), F.lit("wav")
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("__k"),
        (1 + F.col("doc_id") % 64).cast("int").alias("__w"),
        (1 + F.col("doc_id") % 48).cast("int").alias("__h"),
    )
    parsed = image_header_meta(
        synthesize_media_column(docs, "__k", "__w", "__h")
    )
    return parsed.select("doc_id", "kind", "width", "height", "sample_rate")


def _kcore_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # k-core decomposition on a planted graph whose 3-core is
    # analytically determined (K5 clique + K4, with a pendant triangle,
    # a bridge, a path, duplicate/reversed edges and a self-loop that
    # must all peel or dedup away) — the pagerank_cycle_check pattern
    # for iterative fixed points
    import itertools

    from skylinemapreducehadoop_spark.operators.graph import k_core

    edges = list(itertools.combinations(range(5), 2))
    edges += [(10, 11), (11, 12), (10, 12), (0, 10)]
    edges += [(20, 21), (21, 22)]
    edges += list(itertools.combinations(range(30, 34), 2))
    edges += [(1, 0), (0, 1), (7, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    return k_core(df, 3).orderBy("node")


def _analyze_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ANALYZE-style catalog statistics in ONE aggregate pass: per
    # column n_total / n_nulls / exact ndv / min / max (rendered as
    # strings). The double price column rides as exact cents so the
    # string render is engine-deterministic (double->string formatting
    # differs across engines; integers and timestamps do not)
    from skylinemapreducehadoop_spark.functions.profile import analyze_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        "o_orderdate",
        "o_orderpriority",
    )
    return analyze_table(orders).orderBy("col_name")


def _analyze_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 100-TB ANALYZE path actually EXECUTED, not just named in a
    # docstring: sketch NDV (approx_count_distinct, rsd=0.01 — one
    # ordinary aggregate, NO Expand, rows never replicated) joined
    # against the exact NDV on the same columns, asserting the sketch
    # lands within 5x the configured rsd (floor 2) — the
    # approx_distinct_check derived-determinism pattern: HLL register
    # max-merge makes the estimate a pure function of the value SET,
    # so the in-bound boolean is hashable and a broken sketch breaks
    # the hash
    from skylinemapreducehadoop_spark.functions.profile import analyze_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    appr = analyze_table(orders, ndv="approx", rsd=0.01).select(
        "col_name", F.col("ndv").alias("__a")
    )
    exact = analyze_table(orders).select(
        "col_name", "n_total", "n_nulls", F.col("ndv").alias("ndv_exact")
    )
    return (
        exact.join(appr, "col_name")
        .select(
            "col_name",
            "n_total",
            "n_nulls",
            "ndv_exact",
            (
                F.abs(F.col("__a") - F.col("ndv_exact"))
                <= F.greatest(F.ceil(F.col("ndv_exact") * F.lit(0.05)), F.lit(2))
            ).alias("within_bound"),
        )
        .orderBy("col_name")
    )


def _k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # privacy/compliance profiling: equivalence-class-size histogram
    # over a quasi-identifier triple (nation, segment, acctbal floored
    # to 1000s — floor, not round: round's tie rule differs across
    # engines, floor is exact); classes smaller than k=5 are
    # re-identifiable. One aggregate to the class table, one aggregate
    # of THAT to the histogram — never wider than the QI key
    from skylinemapreducehadoop_spark.operators.stats import k_anonymity

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5).orderBy(
        "class_size"
    )


def _length_buckets_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence-length bucket planning: per training bucket cap the doc
    # count, token mass, padding waste and truncation cost — the
    # batcher-throughput readout; JVM token counts, one aggregate
    from skylinemapreducehadoop_spark.functions.text import length_buckets

    docs = load_table(spark, sf_dir, "documents")
    return length_buckets(docs).orderBy("bucket_cap")


def _vocab_coverage_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizer-vocabulary fit: top-500 corpus vocabulary (count desc,
    # token asc — deterministic boundary), per-doc OOV count/rate via
    # one broadcast join over the exploded tokens
    from skylinemapreducehadoop_spark.functions.text import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, vocab_size=500)


def _temperature_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # temperature (alpha=0.5) corpus rebalancing: stratum shares
    # proportional to sqrt(n_s) — downsampling-only, content-hash row
    # selection, integer-floor thresholds; the kept row SET is the
    # contract (the oracle recomputes the same thresholds + md5
    # bucket). The testdata sources are uniform, so the stratum is a
    # derived 6:3:1 head/mid/tail split — sqrt rebalancing must thin
    # head hardest, keep tail whole
    from skylinemapreducehadoop_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "stratum",
        F.when(F.col("doc_id") % 10 < 6, "head")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("tail"),
    )
    return temperature_mix(docs, strata_col="stratum").select(
        "doc_id", "stratum"
    )


def _percentile_ranks_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact global CDF (rank / percent_rank / cume_dist) over the
    # price grid with NO single-partition window — the distributed
    # prefix sum (abc_parts' fix, generalized): range-partitioned
    # distinct-value table, per-partition sums, broadcast offsets. The
    # oracle computes the same CDF with SQL window functions — tiny
    # for DuckDB at sf0.01, a scale-killer shape for a real engine,
    # which is exactly what the operator avoids
    from skylinemapreducehadoop_spark.operators.stats import percentile_ranks

    li = load_table(spark, sf_dir, "lineitem")
    return percentile_ranks(li, "l_extendedprice", scale=100)


def _bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # manual runtime row filtering: Bloom sketch over the selective dim
    # keys (high-balance customers), broadcast might_contain prefilter
    # on the orders scan BEFORE any exchange, exact left-semi join
    # removes the false positives — result bit-identical to the plain
    # semi join (the oracle), fact shuffle proportional to matches
    from skylinemapreducehadoop_spark.operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    rich = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 9000
    )
    return bloom_semi_join(orders, rich, "o_custkey", "c_custkey")


def _seasonal_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekday-seasonality anomaly screen: per-type daily counts vs the
    # same-weekday mean, flagged >2x high / <0.5x low in cleared
    # integer arithmetic — the global-z-score trap (weekends always
    # "anomalous" vs a weekday-dominated mean) done right
    from skylinemapreducehadoop_spark.operators.temporal import seasonal_anomalies

    ev = load_table(spark, sf_dir, "events")
    out = seasonal_anomalies(ev)
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        "n_events",
        "dow_days",
        "dow_total",
        "anomaly",
    ).orderBy("event_type", "day")


def _salted_join_agg_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # skew-proof revenue rollup: salted_join spreads each customer
    # key over 8 salt partitions (right side replicated 8x), then
    # salted_agg two-stages the nation aggregate so no reducer ever
    # owns a hot nation whole. Result must equal the plain join+agg
    # (the oracle) EXACTLY — salting is semantics-preserving; sums
    # fold in decimal so partial/final order cannot move an ulp
    from skylinemapreducehadoop_spark.operators.skew import salted_agg, salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(20,2)").alias("price")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(orders, cust, ["o_custkey"], n_salts=8)
    out = salted_agg(
        joined,
        ["c_nationkey"],
        {
            "n_orders": ("price", "count"),
            "sum_price": ("price", "sum"),
            "max_price": ("price", "max"),
        },
    )
    return out.select(
        "c_nationkey",
        "n_orders",
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


def _bfs_hops_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-source BFS over a sparsified co-purchase graph (parts
    # sharing an order, every 5th order): min hop distance <= 4 from
    # the partkey%97 seed set. Frontier-driven level-synchronous
    # rounds; the oracle re-derives the same distances with a
    # recursive CTE whose UNION-distinct bounds each level at |V|
    from skylinemapreducehadoop_spark.operators.graph import bfs_hops

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    sources = (
        li.where(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    return bfs_hops(edges, sources, max_hops=4)


def _shortest_paths_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded-hop weighted shortest paths (Bellman-Ford, frontier
    # optimized) over the sparsified co-purchase graph with a
    # deterministic integer weight 1 + (src+dst) mod 7; the oracle
    # re-derives min path cost with a hop-carrying recursive CTE
    from skylinemapreducehadoop_spark.operators.graph import shortest_paths

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .withColumn(
            "weight", F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(7))
        )
    )
    sources = (
        li.where(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    return shortest_paths(edges, sources, max_hops=3)


def _leakage_safe_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cluster-aware train/val/test split: near-dup clusters (minhash
    # pairs -> hash-min components) are assigned WHOLE to one split by
    # hashing the cluster id — the eval-contamination guard a per-doc
    # hash split lacks. The oracle closes the same exact-Jaccard pair
    # graph with a recursive CTE and applies the same md5 bucket rule
    from skylinemapreducehadoop_spark.operators import dedup as D
    from skylinemapreducehadoop_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup(docs, threshold=0.5)
    return leakage_safe_split(docs, pairs)


def _negative_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # contrastive negative sampling: per-anchor negatives from the
    # next md5 bucket's k-lowest-hash slate (RNG-free, layout- and
    # engine-independent), excluding exact-hash twins and the minhash
    # near-dup pair list; the slate is broadcast-sized by construction
    from skylinemapreducehadoop_spark.operators import dedup as D
    from skylinemapreducehadoop_spark.operators.sampling import negative_pairs

    docs = load_table(spark, sf_dir, "documents")
    near = D.minhash_near_dup(docs, threshold=0.5)
    return negative_pairs(docs, k=3, buckets=16, exclude_pairs=near)


def _target_encode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # leave-one-out target encoding of event_type against value: the
    # per-key sum folds in decimal so (sum - own)/(n-1) is exact;
    # NULL-value rows get the plain mean, peerless rows get NULL
    from skylinemapreducehadoop_spark.operators.stats import target_encode

    ev = load_table(spark, sf_dir, "events")
    return target_encode(ev, ["event_type"], "value").select(
        "event_id", "event_type", "loo_mean"
    )


def _embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-dimension feature-health profile of the embedding store;
    # all aggregates fold over 1e-6-quantized integers (exact on any
    # layout/engine)
    from skylinemapreducehadoop_spark.operators.similarity import (
        embedding_dim_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb)


def _gram_matrix_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact one-pass Gram matrix (upper triangle) — the PCA/whitening
    # sufficient statistic; pair terms generated in-plan from each
    # row's own array, partial-aggregated before the only shuffle
    from skylinemapreducehadoop_spark.operators.similarity import gram_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(emb)


def _vocab_growth_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Heaps-law vocabulary growth at 10 corpus prefixes in ONE scan:
    # a token is in prefix k iff its min doc_id is, so first-seen +
    # a 10-row cumulative sum replaces 10 re-scans
    from skylinemapreducehadoop_spark.functions.text import vocab_growth

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth(docs, checkpoints=10)


def _attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # last-touch attribution: one running ignorenulls window per user
    # (the sessionize partitioning), no self-join; lag computed as an
    # exact integer micros diff then one division
    from skylinemapreducehadoop_spark.operators.temporal import (
        last_touch_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return last_touch_attribution(
        ev, conversion="purchase", touches=("click", "view"), max_lag="7 days"
    )


def _covariance_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact population covariance (upper triangle) composed in one
    # plan from pair sums + dim sums; single double division at the
    # end so any engine reproduces the bytes
    from skylinemapreducehadoop_spark.operators.similarity import (
        covariance_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return covariance_matrix(emb)


def _skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pre-salting key-distribution diagnostic on the natural skew
    # candidate (user_id); top-k via TakeOrdered, never a global sort
    from skylinemapreducehadoop_spark.operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, "user_id", top_k=10)


def _props_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # semi-structured surface: numeric field out of the JSON props
    # column via get_json_object (JVM, in-scan), profiled per
    # event_type with the exact quantized-fold discipline
    from skylinemapreducehadoop_spark.functions.semistructured import (
        json_field_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return json_field_stats(ev, "props", "$.k", group_by=["event_type"])


def _cm_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable FREQUENCY-sketch columns, the count-min sibling of
    # kmv_rollup_check: per-(type, day) CM sketches fold into per-type
    # totals (CM is linear) and answer point queries without rescanning
    # facts. Buckets are md5-derived (the hash_split cross-engine
    # contract), so the oracle rebuilds the identical sketch in SQL —
    # estimates match bit-for-bit INCLUDING collision overcounts, and
    # the exact count rides along to show the one-sided error
    from skylinemapreducehadoop_spark.operators.sketches import (
        cm_merge,
        cm_query,
        cm_sketch,
    )

    W, D = 1024, 4
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily = cm_sketch(ev, ["event_type", "day"], "user_id", width=W, depth=D)
    merged = cm_merge(daily, ["event_type"], width=W, depth=D)
    probes = (
        ev.where(F.col("user_id") % 50 == 0)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        probes.join(merged, "event_type")
        .select(
            "event_type",
            "user_id",
            cm_query("cm", "user_id", width=W, depth=D).alias("est_cnt"),
            "exact_cnt",
        )
        .orderBy("event_type", "user_id")
    )


def _hist_quantile_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable QUANTILE-sketch columns: per-(month, day) fixed-bin
    # histograms of the order price fold into per-month arrays; p50/
    # p90/p99 read off the merged column at bin granularity — monthly
    # quantiles over a year of facts from ~30 array rows per month,
    # never a raw rescan. Integer-grid bucketing + integer rank
    # arithmetic keep every number engine-exact
    from skylinemapreducehadoop_spark.operators.sketches import (
        hist_merge,
        hist_quantile_edge,
        hist_sketch,
    )

    BINS, BW = 600, 100_000  # $1000-wide bins over [0, $600k) in cents
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = hist_sketch(
        orders, ["month", "day"], "cents", lo=0, bin_width=BW, bins=BINS
    )
    monthly = hist_merge(daily, ["month"], bins=BINS)
    return monthly.select(
        "month",
        F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "n_orders"
        ),
        hist_quantile_edge("hist", 1, 2, lo=0, bin_width=BW).alias("p50_edge"),
        hist_quantile_edge("hist", 9, 10, lo=0, bin_width=BW).alias("p90_edge"),
        hist_quantile_edge("hist", 99, 100, lo=0, bin_width=BW).alias("p99_edge"),
    ).orderBy("month")


def _cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # change-point detection on the daily event-volume series: Page's
    # one-sided CUSUM per event type via its closed form (running sum
    # minus running min — window-expressible, no recursion), scaled to
    # exact longs. Top-3 days per type by the statistic = "where did
    # volume shift upward"
    from pyspark.sql import Window

    from skylinemapreducehadoop_spark.operators.stats import cusum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    c = cusum(daily, "event_type", "day", "n_events")
    w = Window.partitionBy("event_type").orderBy(F.desc("cusum_scaled"), "day")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("event_type", "day", "n_events", "cusum_scaled")
        .orderBy("event_type", F.desc("cusum_scaled"), "day")
    )


def _rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RFM (recency/frequency/monetary) quintile segmentation — the
    # classic customer scoring. Each metric's quintile comes from a
    # GLOBAL row_number via the distributed prefix sum
    # (stats.global_row_number): a plain ntile() would funnel the whole
    # key table through one task, the abc_classify scale-killer. Score
    # = 1 + (rn-1)*5 div N, exact integer arithmetic; N rides along as
    # a broadcast 1-row frame
    from skylinemapreducehadoop_spark.operators.stats import (
        global_row_number_grouped,
    )

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monet_cents"
        ),
    )
    # ONE grouped prefix-sum pass ranks all three metrics (melt to
    # (metric, sort_key) rows, rank, pivot back) instead of chaining
    # three full range-partition/checkpoint/collect machineries —
    # identical ranks: each metric's sort key is the negated value so
    # ascending (key, custkey) order equals the original
    # (desc metric, asc custkey)
    epoch = F.lit("1970-01-01").cast("date")
    melted = per.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("__m"),
                    (-F.datediff(F.col("last_order"), epoch))
                    .cast("long")
                    .alias("__s"),
                ),
                F.struct(
                    F.lit(1).alias("__m"),
                    (-F.col("freq")).cast("long").alias("__s"),
                ),
                F.struct(
                    F.lit(2).alias("__m"),
                    (-F.col("monet_cents")).cast("long").alias("__s"),
                ),
            )
        ).alias("__x"),
    ).select("o_custkey", F.col("__x.__m").alias("__m"), F.col("__x.__s").alias("__s"))
    rankedm = global_row_number_grouped(
        melted, "__m", [F.asc("__s"), F.asc("o_custkey")], out_col="__rn"
    )
    ranked = rankedm.groupBy("o_custkey").agg(
        F.max(F.when(F.col("__m") == 0, F.col("__rn"))).alias("r_rn"),
        F.max(F.when(F.col("__m") == 1, F.col("__rn"))).alias("f_rn"),
        F.max(F.when(F.col("__m") == 2, F.col("__rn"))).alias("m_rn"),
    )
    n = per.agg(F.count(F.lit(1)).alias("__n"))
    score = lambda c: (  # noqa: E731 - tiny local expression builder
        F.lit(1) + F.expr(f"(({c} - 1) * 5) div __n")
    ).cast("int")
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            score("r_rn").alias("r_score"),
            score("f_rn").alias("f_score"),
            score("m_rn").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


def _skipgram_cooc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # skipgram co-occurrence counts (window <= 3 positions ahead) — the
    # word2vec/GloVe co-occurrence table build. Pairs are generated
    # INSIDE the token array with nested higher-order transforms
    # (map-only, zero shuffle before the count aggregate) instead of a
    # positional self-join; the token array binds to a lambda var once
    # so the document is tokenized once per row (the ngrams() rule)
    docs = load_table(spark, sf_dir, "documents")

    def pairs_of(t):
        return F.flatten(
            F.transform(
                t,
                lambda x, i: F.transform(
                    F.slice(t, i + 2, 3),
                    lambda y: F.struct(x.alias("w1"), y.alias("w2")),
                ),
            )
        )

    bound = F.transform(F.array(TX.tokens("text")), pairs_of)[0]
    return (
        docs.select(F.explode(bound).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(30)
    )


def _interval_union_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval-union coverage per user: events open a 300 s activity
    # window; overlapping windows merge (gaps-and-islands: island
    # starts where start > running max of prior ends), covered time =
    # sum of island spans. One per-user ordered window + one aggregate
    # — no interval self-join. The activity-coverage / uptime shape
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("s")
    )
    ev = ev.withColumn("e", F.col("s") + 300)
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "isl").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("e1") - F.col("s0")).alias("covered_s"),
        )
        .orderBy("user_id")
    )


def _streaming_sketch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable-sketch MAINTENANCE under micro-batches (11th streaming
    # driver entry): each foreachBatch builds a per-type count-min
    # sketch of its slice and folds it into the standing sketch table —
    # CM is linear and the three event_id-sliced batches are disjoint,
    # so the final standing column equals the batch-built sketch over
    # ALL events. Point queries at the end reuse the cm_rollup_check
    # oracle verbatim: stream == batch through the sketch algebra,
    # never rescanning earlier batches' raw rows.
    import os
    import tempfile

    from skylinemapreducehadoop_spark.operators.sketches import (
        cm_merge,
        cm_query,
        cm_sketch,
    )

    W, D = 1024, 4
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    tmp = tempfile.mkdtemp(prefix="stream_sketch_replay_")
    src = os.path.join(tmp, "src")
    sk_path = os.path.join(tmp, "sketch")
    for i in range(3):
        (
            ev.where(F.col("event_id") % 3 == i)
            .select("event_type", "user_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    cm_sketch(ev.limit(0), ["event_type"], "user_id", width=W, depth=D).write.mode(
        "overwrite"
    ).parquet(sk_path)

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        batch = bdf.localCheckpoint(eager=True)
        bsk = cm_sketch(batch, ["event_type"], "user_id", width=W, depth=D)
        prev = spark.read.parquet(sk_path)
        merged = cm_merge(
            prev.unionByName(bsk), ["event_type"], width=W, depth=D
        ).localCheckpoint(eager=True)  # materialize BEFORE overwriting its input path
        merged.write.mode("overwrite").parquet(sk_path)

    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("sketch replay did not finish within 600s")
    merged = spark.read.parquet(sk_path)
    probes = (
        ev.where(F.col("user_id") % 50 == 0)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        probes.join(merged, "event_type")
        .select(
            "event_type",
            "user_id",
            cm_query("cm", "user_id", width=W, depth=D).alias("est_cnt"),
            "exact_cnt",
        )
        .orderBy("event_type", "user_id")
    )


def _ab_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-sample z-test per event type over a deterministic hash split
    # of users (md5 parity — the hash_split contract, so assignment is
    # engine-reproducible): Welch z = (mean_a - mean_b) /
    # sqrt(var_a/n_a + var_b/n_b). Moments fold exactly on the integer
    # grid (decimal(38,0) sums of q and q^2 — the linreg discipline);
    # the closed-form floats happen once per (type, arm) pair, in a
    # pinned order, rounded to 6
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0,
        "A",
    ).otherwise("B")
    q = F.round(F.col("value") * 10000).cast("decimal(38,0)")
    g = (
        ev.select("event_type", arm.alias("arm"), q.alias("q"))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("s"),
            F.sum(F.col("q") * F.col("q")).alias("sxx"),
        )
    )
    # mean and sample variance from exact moments, one float step each
    mean = F.col("s").cast("double") / F.col("n") / 10000.0
    var = (
        (
            F.col("sxx").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
        / 1e8
    )
    stats = g.select("event_type", "arm", "n", mean.alias("m"), var.alias("v"))
    a = stats.where(F.col("arm") == "A").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("mean_a"),
        F.col("v").alias("__va"),
    )
    b = stats.where(F.col("arm") == "B").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("mean_b"),
        F.col("v").alias("__vb"),
    )
    z = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        F.col("__va") / F.col("n_a") + F.col("__vb") / F.col("n_b")
    )
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round("mean_a", 6).alias("mean_a"),
            F.round("mean_b", 6).alias("mean_b"),
            F.round(z, 6).alias("z_stat"),
        )
        .orderBy("event_type")
    )


def _weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quantity-weighted exact lower median of the line price per
    # return flag — the weighted "typical price" a plain median
    # mis-states; integer-grid cents + integer weights, boundary
    # cleared of division (stats.weighted_median)
    from skylinemapreducehadoop_spark.operators.stats import weighted_median

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(li, "l_returnflag", "cents", "qty").orderBy(
        "l_returnflag"
    )


def _weighted_deciles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the weighted-median family generalized: quantity-weighted exact
    # p10/p50/p90 of the line price per return flag in ONE pass —
    # adding quantiles adds projection columns, not passes
    from skylinemapreducehadoop_spark.operators.stats import weighted_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_quantiles(
        li, "l_returnflag", "cents", "qty", [(1, 10), (1, 2), (9, 10)]
    ).orderBy("l_returnflag")


def _class_scatter_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # supervised embedding-store diagnostics: per-label WITHIN-class
    # scatter (trace of the class scatter matrix / n, i.e. summed
    # per-dim variance) and BETWEEN-class distance (label centroid vs
    # global centroid, squared) — the Fisher-separability screen run
    # before training on a labeled embedding table. All moments are
    # exact decimal sums on the 1e6 grid; denominators clear via
    # n*ssq - |s|^2 and (N*s_d - n*S_d)^2, so the only float steps are
    # pinned-order divisions per label row. One fact-scan shuffle to
    # the (label, dim) frame (640 rows); everything after is key-table
    # algebra
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    q = F.round(F.col("x").cast("double") * 1000000).cast("decimal(38,0)")
    u = emb.select(
        "label", F.posexplode("embedding").alias("i", "x")
    ).select("label", "i", q.alias("q"))
    per = u.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("q").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("sq"),
    )
    lab = per.groupBy("label").agg(
        F.max("cnt").alias("n"),
        F.sum("sq").alias("ssq"),
        F.sum((F.col("s") * F.col("s")).cast("decimal(38,0)")).alias("s2"),
    )
    # every derived frame renames its columns up front: they all share
    # per's lineage, and Spark's self-join attribute dedup reports
    # spurious ambiguity on same-named attributes otherwise
    glob = (
        per.select(F.col("i").alias("__gi"), F.col("s").alias("__gs"))
        .groupBy("__gi")
        .agg(F.sum("__gs").alias("S"))
    )
    tot = per.where(F.col("i") == 0).agg(F.sum("cnt").alias("__N"))
    lab_n = (
        per.select(F.col("label").alias("__gl"), F.col("cnt").alias("__gc"))
        .groupBy("__gl")
        .agg(F.max("__gc").alias("__nb"))
    )
    bt_in = per.select(
        F.col("label").alias("__bl"),
        F.col("i").alias("__bi"),
        F.col("s").alias("__bs"),
    )
    bt = (
        bt_in.join(glob, F.col("__bi") == F.col("__gi"))
        .join(lab_n, F.col("__bl") == F.col("__gl"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__bl").alias("label"),
            "__nb",
            "__N",
            (
                (F.col("__N") * F.col("__bs") - F.col("__nb") * F.col("S"))
                * (F.col("__N") * F.col("__bs") - F.col("__nb") * F.col("S"))
            ).cast("decimal(38,0)").alias("term"),
        )
        .groupBy("label", "__nb", "__N")
        .agg(F.sum("term").alias("bnum"))
    )
    nd, Nd = F.col("__nb").cast("double"), F.col("__N").cast("double")
    within = (
        (F.col("n") * F.col("ssq") - F.col("s2")).cast("double")
        / F.col("n").cast("double")
        / F.col("n").cast("double")
        / F.lit(1e12)
    )
    between = (
        F.col("bnum").cast("double") / (nd * Nd) / (nd * Nd) / F.lit(1e12)
    )
    return (
        lab.join(bt, "label")
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            F.round(within, 9).alias("within_var"),
            F.round(between, 9).alias("between_dist2"),
        )
        .orderBy("label")
    )


def _kmv_setops_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the remaining KMV SET OPERATIONS: per-type-pair distinct-user
    # UNION and DIFFERENCE sizes straight from the sketch columns
    # (array_union / array_except on the hash sets — exact below
    # capacity, same fail-fast regime as kmv_overlap_check). With
    # intersection this completes the audience set-algebra suite: any
    # boolean combination of segments answered without fact rescans
    from skylinemapreducehadoop_spark.operators.sketches import kmv_sketch

    K = 65536
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    from skylinemapreducehadoop_spark.operators._cache import persist_tracked

    sk = persist_tracked(kmv_sketch(ev, ["event_type"], "user_id", k=K))
    if sk.where(F.size("kmv") >= K).count():
        raise ValueError(f"kmv_setops_check out of its exact regime (K={K})")
    a, b = sk.alias("a"), sk.alias("b")
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.size(F.array_union("a.kmv", "b.kmv")).cast("long").alias("n_union"),
            F.size(F.array_except("a.kmv", "b.kmv")).cast("long").alias("n_a_only"),
            F.size(F.array_except("b.kmv", "a.kmv")).cast("long").alias("n_b_only"),
        )
        .orderBy("type_a", "type_b")
    )


def _langid_confusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # model EVALUATION against real ground truth: the heuristic
    # language-ID's confusion matrix vs the corpus's lang column —
    # (actual, predicted, n), the quality gate a curation pipeline
    # puts around any classifier it deploys. One scoring pass + one
    # count aggregate
    from skylinemapreducehadoop_spark.functions.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs, "text", out_col="predicted")
    return (
        pred.groupBy(F.col("lang").alias("actual"), "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("actual", "predicted")
    )


def _trend_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-series trend detection: OLS slope of the daily event count
    # over the day index, one fit per event type in a single pass
    # (stats.linear_fit_by) — "which event streams are growing".
    # x = exact integer day offset, y = exact count; the oracle mirrors
    # the moment algebra and the float op order
    from skylinemapreducehadoop_spark.operators.stats import linear_fit_by

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    daily = daily.withColumn(
        "day_idx", F.datediff("day", F.lit("2024-01-01").cast("date"))
    )
    return linear_fit_by(
        daily, ["event_type"], "day_idx", "n_events"
    ).orderBy("event_type")


def _version_diff_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CDC between SNAPSHOTS: the versioned table's v1 -> v2 delta via
    # the key-level diff (operators/diff.py) — "what did that upsert
    # actually do" answered from history alone, no change log kept.
    # Composition of two existing primitives; the oracle recomputes
    # the delta from the base table arithmetically
    import os
    import tempfile

    from skylinemapreducehadoop_spark.operators.diff import table_diff_summary
    from skylinemapreducehadoop_spark.sources.versioned import (
        read_version,
        versioned_upsert,
        versioned_write,
    )

    base = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="version_diff_"), "tbl")
    versioned_write(spark, path, base)
    updates = base.where(F.col("k") % 97 == 0).select(
        "k", (F.col("cents") + 500).alias("cents")
    ).unionByName(
        base.where(F.col("k") % 53 == 0).select(
            (F.col("k") + 100_000_000).alias("k"), "cents"
        )
    )
    versioned_upsert(spark, path, updates, ["k"])
    return table_diff_summary(
        read_version(spark, path, 1), read_version(spark, path, 2), ["k"]
    )


def _time_travel_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # snapshot versioning end-to-end (sources/versioned.py): commit
    # the 1995 orders as v1, a deterministic upsert (every 97th key
    # +500 cents, every 53rd key inserted re-keyed) as v2, then read
    # BOTH versions back — VERSION AS OF. The oracle recomputes both
    # states straight from orders, so the manifest protocol, the
    # immutable data dirs and the anti-join upsert are all on the hash
    import os
    import tempfile

    from skylinemapreducehadoop_spark.sources.versioned import (
        read_version,
        versioned_upsert,
        versioned_write,
    )

    base = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    path = os.path.join(tempfile.mkdtemp(prefix="time_travel_"), "tbl")
    versioned_write(spark, path, base)
    updates = base.where(F.col("k") % 97 == 0).select(
        "k", (F.col("cents") + 500).alias("cents")
    ).unionByName(
        base.where(F.col("k") % 53 == 0).select(
            (F.col("k") + 100_000_000).alias("k"), "cents"
        )
    )
    versioned_upsert(spark, path, updates, ["k"])
    out = None
    for v in (1, 2):
        snap = (
            read_version(spark, path, v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(F.lit(v).alias("version"), "n_rows", "sum_cents")
        )
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version")


def _bmp_pixel_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SECOND real no-codec pixel-decode tier: 24-bit uncompressed
    # BMPs (bottom-up BGR byte walk — multimodal._bmp_decode) carrying
    # the same closed-form RGB planes as the PNG fixture, decoded by
    # image_pixel_stats through the exact Rec.601 luma; the oracle
    # recomputes every pixel arithmetically from doc_id, so the BMP
    # encoder, the byte-walk decoder and the luma are all on the hash
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_pixel_stats,
        synthesize_rgb_bmp_column,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return image_pixel_stats(synthesize_rgb_bmp_column(docs, "doc_id")).orderBy(
        "doc_id"
    )


def _impute_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL imputation by per-group exact median — the standard feature
    # prep step, with NULLs planted deterministically (every 13th
    # event, the table_diff perturbation pattern) so the entry is
    # non-vacuous at any sf. Median on the integer grid = exact
    # half-integer (med_x2 long, the mad_outliers discipline); the
    # imputed column's checksum rides along to prove the fills landed.
    # Shape: one percentile aggregate to a |types|-row frame, broadcast
    # back — the fact table never shuffles
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_id") % 13 == 0, F.lit(None).cast("long")
        ).otherwise(F.round(F.col("value") * 10000).cast("long")).alias("q"),
    )
    med = (
        ev.where(F.col("q").isNotNull())
        .groupBy("event_type")
        .agg((F.percentile("q", F.lit(0.5)) * 2).cast("long").alias("med_x2"))
    )
    j = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_x2",
        F.when(F.col("q").isNull(), 1).otherwise(0).alias("was_null"),
        F.coalesce(2 * F.col("q"), F.col("med_x2")).alias("q2"),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("was_null").alias("n_imputed"),
            F.round(F.max("med_x2").cast("double") / 2 / 10000, 6).alias(
                "median_value"
            ),
            F.sum("q2").alias("sum_q2"),
        )
        .orderBy("event_type")
    )


def _grouped_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-customer top-3 orders WITHOUT a rank window: top-k as a
    # map-side-combinable aggregate (two-level slice-sort, the
    # kmv_sketch shape) — only k rows per (group, input partition)
    # ever shuffle, vs the window's full Exchange+Sort of every row.
    # Exact cents grid gives the deterministic total order
    from skylinemapreducehadoop_spark.operators.sampling import grouped_topk

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    return grouped_topk(
        orders,
        ["o_custkey"],
        ["cents", "o_orderkey"],
        3,
        payload_cols=["o_orderkey", "cents"],
    ).orderBy("o_custkey", "rank")


def _kmv_overlap_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KMV SET OPERATIONS: distinct-user overlap between event-type
    # pairs straight from the per-type sketch columns (array_intersect
    # of hash sets) — audience-overlap analytics without rescanning or
    # re-shuffling facts. K exceeds per-type distinct users at driver
    # sfs, so sketches hold the full hash set and the intersection is
    # exact (collision probability ~d^2/2^65); the capacity fail-fast
    # mirrors kmv_rollup_check
    from skylinemapreducehadoop_spark.operators.sketches import kmv_sketch

    K = 65536
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    from skylinemapreducehadoop_spark.operators._cache import persist_tracked

    sk = persist_tracked(kmv_sketch(ev, ["event_type"], "user_id", k=K))
    at_capacity = sk.where(F.size("kmv") >= K).count()
    if at_capacity:
        raise ValueError(
            f"kmv_overlap_check out of its exact regime: {at_capacity} "
            f"sketch(es) at capacity K={K}; raise K or drop the exact oracle"
        )
    a, b = sk.alias("a"), sk.alias("b")
    # a handful of per-type sketch rows — the tiny theta self-join is
    # the point (the fact table is long gone)
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.size(F.array_intersect("a.kmv", "b.kmv"))
            .cast("long")
            .alias("n_common_users"),
        )
        .orderBy("type_a", "type_b")
    )


def _rrf_fusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hybrid-retrieval fusion: the BM25 lexical top-200 and a
    # term-coverage ranking (distinct query terms hit, shorter docs
    # first) fuse by reciprocal rank — the standard lexical+secondary
    # ranker combiner. Ranks come from row_number over the LIMITed
    # candidate frames (bounded, the documented limit-window pattern)
    from pyspark.sql import Window

    from skylinemapreducehadoop_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    docs = load_table(spark, sf_dir, "documents")
    lex = bm25_topk(docs, _BM25_TERMS, k=200)
    w_lex = Window.orderBy(F.desc("score"), "id")
    lex_rn = lex.select("id", F.row_number().over(w_lex).alias("rn"))
    tok = docs.select(
        F.col("doc_id").alias("id"), F.explode(TX.tokens("text")).alias("tok")
    )
    cov = (
        tok.groupBy("id")
        .agg(
            F.count_distinct(
                F.when(F.col("tok").isin(list(_BM25_TERMS)), F.col("tok"))
            ).alias("n_hits"),
            F.count(F.lit(1)).alias("dl"),
        )
        .where(F.col("n_hits") > 0)
        .orderBy(F.desc("n_hits"), "dl", "id")
        .limit(200)
    )
    w_cov = Window.orderBy(F.desc("n_hits"), "dl", "id")
    cov_rn = cov.select("id", F.row_number().over(w_cov).alias("rn"))
    return (
        rrf_fuse([lex_rn, cov_rn], id_col="id", rank_col="rn")
        .orderBy(F.desc("rrf_score"), "id")
        .limit(20)
        .select(F.col("id").alias("doc_id"), "n_lists", "rrf_score")
    )


def _item_cf_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # item-item collaborative filtering over order baskets: cosine
    # co-occurrence similarity, the "customers who bought a also
    # bought b" recommender primitive — basket-bounded pair join,
    # exact-integer counts, one rounded sqrt division
    from skylinemapreducehadoop_spark.operators.stats import cooccur_similarity

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return cooccur_similarity(
        li, "l_orderkey", "l_partkey", min_support=3, k=50
    )


def _winnow_fingerprints_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MOSS-style winnowing fingerprints per document: md5-hashed word
    # 3-grams, window-4 minima, dedup — all nested JVM array ops,
    # map-only until the final per-doc profile. The sublinear robust
    # fingerprint set a plagiarism/near-dup screen persists instead of
    # full gram sets
    docs = load_table(spark, sf_dir, "documents")
    fps = TX.winnow_fingerprints("text", gram_k=3, window=4)
    # pre-filter on the RAW text: size(__fp) > 0 ⟺ the doc has >= 3
    # tokens (fewer than gram_k tokens yields no grams hence no
    # fingerprints; >= gram_k always yields >= 1). Filtering on __fp
    # itself made Catalyst push the predicate below the projection with
    # the whole md5-per-gram winnow chain INLINED — every row paid the
    # fingerprint pipeline twice (once in the Filter, once in the
    # Project). The token-count test costs one split.
    return (
        docs.where(F.size(TX.tokens("text")) >= 3)
        .select("doc_id", fps.alias("__fp"))
        .select(
            "doc_id",
            F.size("__fp").cast("long").alias("n_fingerprints"),
            F.array_min("__fp").alias("min_fp"),
            F.array_max("__fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


def _containment_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # length-asymmetric near-dup screen: k-gram CONTAINMENT
    # |A∩B|/min(|A|,|B|) >= 0.8 — catches a short doc pasted inside a
    # long one, which Jaccard scores near 0. Inverted-index pair
    # generation (grams travel as xxhash64 longs); the oracle is the
    # all-pairs list_intersect twin at test scale
    from skylinemapreducehadoop_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.8)


def _twap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type TIME-weighted mean of the value series (each observation
    # holds until the next — the sensor/price correct mean; a plain AVG
    # over-weights bursts): exact micros deltas, decimal-folded
    # products, one per-group lead window, event_id tie-break
    from skylinemapreducehadoop_spark.operators.temporal import (
        time_weighted_avg,
    )

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(
        ev, by="event_type", value_col="value", tiebreak_col="event_id"
    ).orderBy("event_type")


def _abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pareto/ABC classification of parts by revenue: the fact table
    # reduces to the key table in one map-side-combined aggregate, the
    # running-share window orders keys (never rows), and both class
    # boundaries clear the division (cum*100 <= total*pct in exact
    # decimal) — the key straddling 80% cannot flip with ulp noise
    from skylinemapreducehadoop_spark.operators.stats import abc_classify

    li = load_table(spark, sf_dir, "lineitem")
    return abc_classify(li, "l_partkey", "l_extendedprice")


def _resize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the RESIZE step of the multimodal pipeline end-to-end with no
    # codec library, over BOTH stdlib color types: per document a real
    # gray8 PNG (pixel(x,y) = (k + 7x + 13y) % 256) AND a real RGB8
    # PNG (R=(k+5x+11y)%256, G=(3k+7x+y)%256, B=(2k+x+13y)%256, read
    # through the exact integer Rec.601 luma (299R+587G+114B)//1000),
    # stdlib-decoded (zlib inflate + full RFC 2083 unfiltering at the
    # right bytes-per-pixel), nearest-resized to 8x6 with the exact
    # floor mapping src = (dst*src_extent)//dst, re-encoded, then
    # decoded BACK by image_pixel_stats — the oracle recomputes both
    # sampled pixel grids arithmetically from doc_id, so encoder,
    # decoder, unfilter, luma and resize mapping are all on the hash
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_pixel_stats,
        resize_images,
        synthesize_gray_png_column,
        synthesize_rgb_png_column,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    both = (
        synthesize_gray_png_column(docs, "doc_id")
        .withColumn("src", F.lit("gray"))
        .unionByName(
            synthesize_rgb_png_column(docs, "doc_id").withColumn("src", F.lit("rgb"))
        )
    )
    resized = resize_images(both, 8, 6, id_cols=("doc_id", "src"), decoder="stdlib")
    return image_pixel_stats(
        resized.select("doc_id", "src", "media"), id_cols=("doc_id", "src")
    )


def _novelty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-document trigram novelty (share of grams occurring in no
    # other document) — the self-corpus complement of the
    # decontamination probe; grams shuffle as 64-bit hashes, the
    # oracle compares on raw gram strings (collision-free at test
    # scale by construction)
    from skylinemapreducehadoop_spark.operators.dedup import novelty_score

    docs = load_table(spark, sf_dir, "documents")
    return novelty_score(docs, k=3)


def _fd_check_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # functional-dependency profiling: custkey->nationkey must hold
    # (key), nationkey->mktsegment must not (25 nations x 5 segments);
    # one column-pruned aggregate pass per dependency, no joins
    from skylinemapreducehadoop_spark.operators.stats import fd_check

    cust = load_table(spark, sf_dir, "customer")
    return fd_check(
        cust,
        [("c_custkey", "c_nationkey"), ("c_nationkey", "c_mktsegment")],
    ).orderBy("dependency")


def _mutual_information_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact MI (bits) between event type and calendar day-of-month:
    # integer-arg log2 terms summed by ascending sorted fold — the
    # information-theoretic profiling sibling of pmi_collocations
    from skylinemapreducehadoop_spark.operators.stats import mutual_information

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofmonth("ts").alias("dom")
    )
    return mutual_information(ev, "event_type", "dom")


def _kmv_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mergeable distinct-sketch COLUMNS: per-(type, day) KMV sketches
    # folded into per-type totals without rescanning the fact table —
    # the daily-rollup-with-sketches pattern. k=65536 exceeds the
    # distinct-user cardinality at every driver sf, so the estimator is
    # in its exact regime and the folded answer equals COUNT(DISTINCT)
    # (collision probability ~d^2/2^65 — negligible); past k the same
    # column degrades to the (k-1)/u_k estimator (accuracy pytest).
    from skylinemapreducehadoop_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    K = 65536
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    daily = kmv_sketch(ev, ["event_type", "day"], "user_id", k=K)
    from skylinemapreducehadoop_spark.operators._cache import persist_tracked

    merged = persist_tracked(kmv_merge(daily, ["event_type"], k=K))
    # regime fail-fast: at sketch size == K the estimator fires and the
    # COUNT(DISTINCT) oracle would mismatch SILENTLY — if a future
    # generator/sf pushes any type to K distinct users, raise instead
    at_capacity = merged.where(F.size("kmv") >= K).count()
    if at_capacity:
        raise ValueError(
            f"kmv_rollup_check out of its exact regime: {at_capacity} "
            f"group sketch(es) at capacity K={K}; raise K or drop the "
            "exact-count oracle for this entry"
        )
    return merged.select(
        "event_type",
        F.col("n_merged").alias("n_days"),
        kmv_estimate("kmv", k=K).cast("long").alias("distinct_users"),
    ).orderBy("event_type")


def _streaming_maintenance_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the lakehouse maintenance loop as the 10th streaming driver entry:
    # CDC-style upsert batches arrive as a file stream; every micro-batch
    # (maxFilesPerTrigger=1 -> three real batches) runs foreachBatch =
    # crash-consistent partitioned upsert of the BASE table
    # (sources/merge.py) + incremental splice of the maintained daily
    # ROLLUP (operators/rollup.py), rollup first (it needs the
    # pre-upsert base). Batches carry disjoint key sets, so the final
    # state is replay-order-independent; the oracle is a full recompute
    # of the fully-merged table — stream == batch, end to end through
    # BOTH maintenance primitives.
    import os
    import tempfile

    from skylinemapreducehadoop_spark.operators.rollup import (
        incremental_rollup_update,
        rollup_table,
    )
    from skylinemapreducehadoop_spark.sources.merge import upsert_partitioned

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1995)
        .select(
            F.col("o_orderkey").alias("k"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="stream_maint_replay_")
    base_path = os.path.join(tmp, "base")
    rollup_path = os.path.join(tmp, "rollup")
    src = os.path.join(tmp, "src")
    with_month = orders.withColumn("month", F.substring("day", 1, 7))
    with_month.write.partitionBy("month").parquet(base_path)
    rollup_table(orders, "day", ["cents"]).write.parquet(rollup_path)
    for i in range(3):
        (
            orders.where(
                (F.col("k") % 97 == 0) & (F.expr("(k div 97) % 3") == i)
            )
            .select("k", "day", (F.col("cents") + 1000 * (i + 1)).alias("cents"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        batch = bdf.localCheckpoint(eager=True)
        base = spark.read.parquet(base_path).select("k", "day", "cents")
        prev = spark.read.parquet(rollup_path)
        new_rollup = incremental_rollup_update(
            prev, base, batch, key_cols=["k"], bucket_col="day", sum_cols=["cents"]
        ).localCheckpoint(eager=True)  # materialize BEFORE overwriting the path it reads
        upsert_partitioned(
            spark,
            base_path,
            batch.withColumn("month", F.substring("day", 1, 7)),
            ["k"],
            "month",
        )
        new_rollup.write.mode("overwrite").parquet(rollup_path)

    stream = (
        spark.readStream.schema("k long, day string, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # a False return means the stream is STILL RUNNING — reading the
    # rollup then would race a later micro-batch's overwrite of the
    # same path; fail loudly instead of hashing a partial state
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("maintenance replay did not finish within 600s")
    return (
        spark.read.parquet(rollup_path)
        .select("day", "n_rows", "sum_cents")
        .orderBy("day")
    )


def _incremental_rollup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # maintained daily rollup under an upsert batch: every 97th order
    # gets +1000 cents, every 194th ALSO moves one day forward (the
    # cross-bucket case). The incremental path re-aggregates ONLY
    # touched days and splices into the previous rollup; the oracle is
    # a FULL recompute of the merged table — the maintenance law
    # checked end-to-end (operators/rollup.py)
    from skylinemapreducehadoop_spark.operators.rollup import (
        incremental_rollup_update,
        rollup_table,
    )

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    batch = base.where(F.col("k") % 97 == 0).select(
        "k",
        F.when(
            F.col("k") % 194 == 0,
            F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd"),
        )
        .otherwise(F.col("day"))
        .alias("day"),
        (F.col("cents") + 1000).alias("cents"),
    )
    prev = rollup_table(base, "day", ["cents"])
    return incremental_rollup_update(
        prev, base, batch, key_cols=["k"], bucket_col="day", sum_cols=["cents"]
    ).orderBy("day")


def _golden_records_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # survivorship over synthetic duplicate clusters (custkey % 500):
    # per field the most-voted non-NULL value, ties to the smallest —
    # the canonical-record half of entity resolution, one stack + one
    # agg + one bounded window + explicit-values pivot
    from skylinemapreducehadoop_spark.operators.dedup import golden_records

    cust = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 500).alias("cluster"),
        "c_mktsegment",
        "c_nationkey",
    )
    return golden_records(cust, "cluster", ["c_mktsegment", "c_nationkey"])


def _autocorr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type autocorrelation of the daily event-count series at lags
    # 1-3: gap-aware self-join pairing on day arithmetic, six exact
    # decimal moments, one closed-form float correlation per (type,
    # lag) — the time-series sibling of corr_lineitem
    from skylinemapreducehadoop_spark.operators.stats import autocorrelation

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("t"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return autocorrelation(daily, "event_type", "t", "c").orderBy(
        "event_type", "lag"
    )


def _mad_outliers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust (median/MAD) outlier counts per order priority, decided in
    # exact long arithmetic (26980*d2 > 70000*mad_x4 — the modified
    # z-score with every division cleared); medians are exact half-grid
    # points so med_x2/mad_x4 are exact longs, never float-rounded
    from skylinemapreducehadoop_spark.operators.stats import mad_outliers

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return mad_outliers(orders, "cents", "o_orderpriority").orderBy(
        "o_orderpriority"
    )


def _audio_features_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the audio DECODE tier end-to-end: build a real 16-bit PCM WAV
    # per document whose waveform is a closed-form function of doc_id,
    # then extract count/rate/peak/mean/RMS back through the Arrow-
    # batched RIFF-walk decoder. The oracle recomputes every field
    # from doc_id without seeing bytes (the image_header_check pattern
    # for the audio family) — exact integer accumulation with one
    # double division, so the hash match is bit-level.
    from skylinemapreducehadoop_spark.operators.multimodal import (
        audio_features,
        synthesize_pcm_wav_column,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = audio_features(synthesize_pcm_wav_column(docs, "doc_id"))
    return out.select(
        "doc_id",
        F.col("audio.n_samples").alias("n_samples"),
        F.col("audio.sample_rate").alias("sample_rate"),
        F.col("audio.peak_abs").alias("peak_abs"),
        F.round("audio.mean_amp", 6).alias("mean_amp"),
        F.round("audio.rms", 6).alias("rms"),
    )


def _set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f.intersect(o)


def _rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double").alias("revenue"),
    )


def _anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def _sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
        .select("user_id", "event_id", "session_id")
    )


def _cohort_retention_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # classic cohort retention: users grouped by first-activity day,
    # distinct active users per (cohort, day offset). Two hash aggs +
    # one equi-join — the min-date "first touch" is map-side combined
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("cohort")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "cohort",
            F.datediff(F.to_date("ts"), F.to_date("cohort")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


def _top_paths_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # path analysis: each user's first 5 event types in time order
    # (event_id breaks ts ties), frequency of each path. One window
    # pass + two aggs; the path string is bounded, not event-stream-
    # sized, so the final group-by key stays small at any scale
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return first5.groupBy("path").agg(F.count("*").alias("n_users"))


def _fuzzy_pairs_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deletion-neighborhood fuzzy join (FastSS/SymSpell family):
    # all distinct p_name pairs at Levenshtein distance 1 via hash
    # equi-join on 1-deletion keys + exact verify — no cartesian
    from skylinemapreducehadoop_spark.operators.fuzzy import fuzzy_join_ed1

    part = load_table(spark, sf_dir, "part")
    return fuzzy_join_ed1(part, "p_name")


def _entity_resolution_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # end-to-end entity resolution as pure operator composition:
    # deletion-neighborhood blocking (no cartesian) -> exact verify ->
    # star connected components over the match graph -> canonical form
    # = lexicographic cluster minimum; singletons canonicalize to
    # themselves. Oracle: recursive-CTE transitive closure.
    from skylinemapreducehadoop_spark.operators.fuzzy import fuzzy_join_ed1

    part = load_table(spark, sf_dir, "part")
    pairs = fuzzy_join_ed1(part, "p_name").select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    )
    clusters = D.dedup_clusters(pairs, algorithm="star")
    names = (
        part.select(F.col("p_name")).where(F.col("p_name").isNotNull()).distinct()
    )
    return names.join(
        clusters, names["p_name"] == clusters["doc_id"], "left"
    ).select(
        "p_name", F.coalesce("cluster_id", "p_name").alias("canonical")
    )


def _trailing_hour_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row trailing 1h count/sum per user (fraud/rate-limit feature
    # shape) — one microsecond-exact range window, decimal-folded sums
    from skylinemapreducehadoop_spark.operators.temporal import trailing_time_stats

    ev = load_table(spark, sf_dir, "events")
    return trailing_time_stats(ev, duration="1 hour")


def _scd2_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SCD2 version history from a change log: consecutive equal values
    # collapse, half-open validity intervals, event_id breaks ts ties
    from skylinemapreducehadoop_spark.operators.temporal import scd2_from_changelog

    ev = load_table(spark, sf_dir, "events")
    return scd2_from_changelog(
        ev, key_col="user_id", value_col="event_type", order_cols=["event_id"]
    )


def _pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank over the (symmetrized) near-dup pair graph — iterative
    # float fixed point, not SQL-expressible → rows-only; ranks are
    # numpy-verified to 1e-9 in tests/test_graph.py
    from skylinemapreducehadoop_spark.operators._cache import persist_tracked
    from skylinemapreducehadoop_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    # persist: the symmetrizing union below references the minhash pair
    # join twice in one plan — unpersisted, the near-dup join ran twice
    pairs = persist_tracked(
        D.minhash_near_dup(docs, threshold=0.5).select("id_a", "id_b")
    )
    edges = pairs.selectExpr("id_a as src", "id_b as dst").union(
        pairs.selectExpr("id_b as src", "id_a as dst")
    )
    return pagerank(edges, n_iter=8)


def _kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed Lloyd's k-means — iterative algorithm, not
    # SQL-expressible → rows-only check (omitted from oracle_sql);
    # tests/test_similarity.py proves exact recovery of separated
    # clusters and partitioning-independence
    from skylinemapreducehadoop_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lloyd(emb, k=8, n_iter=5)
    return assigned.select("vec_id", "cluster")


def _pagerank_cycle_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived DETERMINISTIC check for the iterative PageRank loop (the
    # ANN-recall pattern, r6 verdict Missing #3): on a directed
    # 100-cycle every node has in-degree 1, so each iteration's rank
    # sum has exactly ONE addend — no float reordering is possible
    # under ANY partitioning — and the fixed point is analytically
    # 1/n at every iteration. round(9) absorbs the few-ulp
    # literal-vs-computed difference; any bug in the contribution
    # join, degree handling, dangling mass, or base term shifts ranks
    # by orders of magnitude more.
    from skylinemapreducehadoop_spark.operators.graph import pagerank

    n = 100
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    pr = pagerank(edges, n_iter=8)
    return pr.select("id", F.round("rank", 9).alias("rank"))


def _kmeans_blobs_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived DETERMINISTIC check for distributed Lloyd's k-means:
    # four planted blobs 10.0 apart with 0.025 intra-blob spread and
    # ids arranged so the deterministic init (4 smallest ids) seeds
    # one center per blob. Assignment is then ulp-robust, so the
    # per-cluster sizes are exact integers the oracle derives from
    # the construction. Exercises the full distributed loop:
    # broadcast-centroid assignment matmul + k x d centroid update
    # aggregate x 3 iterations.
    from skylinemapreducehadoop_spark.operators.similarity import kmeans_lloyd

    pts = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(
            ((F.col("id") % 4) * F.lit(10.0))
            + (F.floor(F.col("id") / 4) * F.lit(0.001)),
            F.lit(0.0),
        ).alias("embedding"),
    )
    assigned, _ = kmeans_lloyd(pts, id_col="vec_id", vec_col="embedding", k=4, n_iter=3)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n_members"))
        .select(F.col("cluster").cast("int").alias("cluster"), "n_members")
    )


def _gapfill_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time_bucket_gapfill + locf: missing hours materialize with
    # n_events=0 and the last non-empty hour's sum carried forward
    from skylinemapreducehadoop_spark.operators.temporal import gapfill_time_series

    ev = load_table(spark, sf_dir, "events")
    return gapfill_time_series(ev, ts_col="ts", by="event_type", value_col="value")


def _asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skylinemapreducehadoop_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(clicks, purchases, on="ts", by="user_id", right_cols=["event_id"])
    return out.select("user_id", "event_id", "ts", "event_id_right", "ts_right")


def _range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skylinemapreducehadoop_spark.operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = range_join(
        ev, ev, left_on="ts", right_on="ts", by="user_id",
        lower_seconds=0, upper_seconds=300,
    )
    return out.select("user_id", "event_id", F.col("event_id_r").alias("event_id_after"))


def _distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# revenue terms are computed in exact decimal (ep dec(12,2), disc dec(6,4)
# -> product dec(19,6); no precision overflow in Spark or DuckDB) and cast
# to double only at the very end, so value hashes match bit-for-bit.
# (column factories, not constants: F.col needs an active SparkContext)
def _ep_dec():
    return F.col("l_extendedprice").cast("decimal(12,2)")


def _disc_dec():
    return F.col("l_discount").cast("decimal(6,4)")


def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (F.sum(_ep_dec()) - F.sum(_ep_dec() * _disc_dec()))
            .cast("double")
            .alias("revenue")
        )
    )


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_ep_dec() * _disc_dec()).cast("double").alias("revenue"))
    )


def _q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg(l_quantity) is exact (integer-valued doubles sum without rounding),
    # so the 0.2*avg threshold is engine-independent.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    thresholds = (
        li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_limit"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg((F.sum(_ep_dec()).cast("double") / 7.0).alias("avg_yearly"))
    )


def _q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer and supplier must share a nation: the classic 5-way join
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(_ep_dec()) - F.sum(_ep_dec() * _disc_dec()))
            .cast("double")
            .alias("revenue")
        )
    )


def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            (F.sum(_ep_dec()) - F.sum(_ep_dec() * _disc_dec()))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q4-style EXISTS: orders with at least one lineitem shipped after
    # the order date (the testdata schema has no commit/receipt dates)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def _q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q2-style correlated scalar-MIN over the supply relation: for each
    # ECONOMY part of one size, the supplier(s) in one region offering
    # the minimum unit price (no partsupp — the supply relation is the
    # (part, supplier) pairs derived from lineitem with min
    # extendedprice as the offer). Catalyst turns the correlated min
    # into an aggregate + equi-join; the region-nation-supplier dim
    # chain broadcasts. Ties on the min keep every tied supplier, like
    # the original q2.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_type"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )

    sn = supp.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.where(F.col("r_name") == "ASIA")),
                nation.n_regionkey == region.r_regionkey,
            )
        ),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")

    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer"))
        .join(sn, F.col("l_suppkey") == sn.s_suppkey)
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("offer").alias("best_offer")
    )
    return (
        offers.join(
            best,
            (offers.l_partkey == best.b_partkey)
            & (offers.offer == best.best_offer),
        )
        .join(
            F.broadcast(
                part.where(
                    (F.col("p_size") == 5) & (F.col("p_type") == "ECONOMY")
                )
            ),
            offers.l_partkey == part.p_partkey,
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )


def _q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q21-style multi-way correlated EXISTS + NOT-EXISTS on the fact
    # table: suppliers who were the ONLY supplier with a returned line
    # in a finished multi-supplier order (the testdata schema has no
    # commit/receipt dates, so "problem line" = l_returnflag = 'R').
    # Planner shape: fact self-join as left_semi AND left_anti with a
    # non-equi guard, dims broadcast.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = l1.select("l_orderkey", "l_suppkey").alias("l3")
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        cand.join(
            orders.where(F.col("o_orderstatus") == "F"),
            cand.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_9")),
            supp.s_nationkey == nation.n_nationkey,
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def _q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q20-style nested IN + correlated scalar aggregate: suppliers in
    # one nation who shipped >30% of their all-time volume of some
    # red part during 1995 (no partsupp in this schema — the supply
    # relation is the (supplier, part) pairs derived from lineitem,
    # and "availqty vs half the shipped qty" becomes "1995 qty vs 30%
    # of all-time qty"). Catalyst decorrelates the scalar subquery
    # into an aggregate + equi-join; part and the pair set broadcast.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    red_parts = part.where(F.col("p_name").like("red%")).select("p_partkey")
    qty95 = (
        li.where(F.year("l_shipdate") == 1995)
        .join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty95"))
    )
    total = li.groupBy(
        F.col("l_suppkey").alias("t_suppkey"), F.col("l_partkey").alias("t_partkey")
    ).agg(F.sum("l_quantity").alias("qty_all"))
    excess = (
        qty95.join(
            total,
            (qty95.l_suppkey == total.t_suppkey)
            & (qty95.l_partkey == total.t_partkey),
        )
        .where(F.col("qty95") > 0.3 * F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.l_suppkey, "left_semi")
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_9")),
            supp.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_name")
    )


def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bidirectional nation-pair trade volume by ship year
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("n1_key"))
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        (F.sum(_ep_dec()) - F.sum(_ep_dec() * _disc_dec()))
        .cast("double")
        .alias("revenue")
    )


def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 adapted to this schema (no partsupp): NATION_2's share
    # of ASIA-customer ECONOMY-part revenue by order year. Dimension
    # sides all broadcast; one shuffle for the year aggregation.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n1 = nation.join(
        region.where(F.col("r_name") == "ASIA"),
        nation.n_regionkey == region.r_regionkey,
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _ep_dec() - _ep_dec() * _disc_dec()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(19,6)")
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)).cast(
                "double"
            )
            / F.sum(vol).cast("double")
        ).alias("mkt_share")
    )


def _q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 adapted (no ps_supplycost in this schema): revenue from
    # '%bolt%' parts by supplier nation × order year
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("bolt")
    ).select("p_partkey")
    amount = _ep_dec() - _ep_dec() * _disc_dec()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(amount).cast("double").alias("sum_profit"))


def _q11_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 adapted (no partsupp): brands whose lineitem revenue
    # exceeds 1/25 of total — scalar-subquery HAVING over one reusable
    # brand aggregate (computed once, total via its own re-aggregation)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = _ep_dec() - _ep_dec() * _disc_dec()
    brand_val = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(rev).alias("__val"))
    )
    total = brand_val.agg(F.sum("__val").alias("__total"))
    return (
        brand_val.crossJoin(F.broadcast(total))
        .where(F.col("__val").cast("double") * 25.0 > F.col("__total").cast("double"))
        .select("p_brand", F.col("__val").cast("double").alias("brand_value"))
    )


def _q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13: orders-per-customer histogram; the left join keeps
    # zero-order customers in the c_count=0 bucket
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15: supplier(s) with the maximum revenue over one quarter;
    # the max is a broadcast scalar, equality tested on EXACT decimals
    # (a double round-trip could split ties)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_ep_dec() - _ep_dec() * _disc_dec()).alias("__rev"))
    )
    mx = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__max_rev"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_revenue")
        )
    )


def _q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q12-style conditional aggregation (no l_shipmode in the testdata:
    # l_linestatus stands in for the group key)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def _q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # promo revenue share: both sums are exact decimals; the final
    # division is one IEEE op on identical operands in both engines
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _ep_dec() - _ep_dec() * _disc_dec()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(19,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def _q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct suppliers per (brand, type) over mid-size parts
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") >= 10) & (F.col("p_size") <= 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def _q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q19's OR-of-conjunctions predicate shape (brand × size × quantity)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 25) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 35) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            (F.sum(_ep_dec()) - F.sum(_ep_dec() * _disc_dec()))
            .cast("double")
            .alias("revenue")
        )
    )


def _q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q22: rich customers (above the positive-balance mean) with no
    # URGENT order, per nation. (Every test customer has SOME order, so
    # the classic "never ordered" filter would be vacuously empty.)
    # Division-free mean compare (acctbal*n > total, exact decimals) so
    # the threshold is engine-exact.
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    pos = cust.where(F.col("c_acctbal") > 0)
    stats = pos.agg(
        F.sum(bal).alias("tot"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
    )
    rich = (
        cust.join(F.broadcast(stats))
        .where(bal * F.col("n") > F.col("tot"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


def _window_analytics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window-function breadth: lag/lead, running sum, dense_rank, ntile
    # over a deterministic (date, key) order within each customer
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(12,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.sum(price_dec).over(run).cast("double").alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


def _window_analytics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the window_analytics_orders surface at EVENTS volume (20x the
    # rows per sf): lag/lead, running sum, row_number, ntile, plus an
    # inter-event time delta — the window-spill stress case (many rows
    # per user_id partition, ordered by timestamp)
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val_dec = F.col("value").cast("decimal(12,2)")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.sum(val_dec).over(run).cast("double").alias("running_value"),
        F.row_number().over(w).alias("event_seq"),
        F.ntile(4).over(w).alias("quartile"),
        # coalesce: BIGINT-with-NULL round-trips as float64 in pandas on
        # one side but not the other — sentinel keeps the dtype integral
        F.coalesce(gap_us, F.lit(-1)).alias("gap_us"),
    )


def _sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic content-hash Bernoulli sample — reproducible on any
    # engine/layout (md5 bucket, no RNG), unlike df.sample()
    from skylinemapreducehadoop_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, ["text"], 0.2).select("doc_id", "n_chars")


def _stratified_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-k-per-stratum deterministic sample (balanced eval sets);
    # per-stratum rank window, no global sort
    from skylinemapreducehadoop_spark.operators.sampling import stratified_topk_sample

    docs = load_table(spark, sf_dir, "documents")
    # doc_id tiebreaker: duplicate texts within a stratum tie on
    # (hash, text) — without a unique final key, which physical row
    # wins rank k would be partition-dependent (ADVICE r6)
    return stratified_topk_sample(
        docs, "source", 5, ["text"], tiebreak_cols=["doc_id"]
    ).select("doc_id", "source", "n_chars")


def _equidepth_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quantile histogram WITHOUT the single-partition ntile sort:
    # exact percentile boundaries (one agg) + broadcast assignment
    ev = load_table(spark, sf_dir, "events")
    return equidepth_histogram(ev, "value", nbins=8)


def _events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-resolution rollup REUSING hourly partials (combiner law:
    # day sums fold the hour sums — decimal all the way, cast once);
    # oracle aggregates straight to day, proving the fold is lossless
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").start.alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("value").cast("decimal(20,4)")).alias("__sv"),
    )
    # day as a STRING: DuckDB DATE becomes datetime64 through pandas
    # (midnight timestamp) while Spark DateType stays a date — the
    # comparator would see different cell types for equal days
    return hourly.groupBy(
        F.date_format("hour_start", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.sum("__n").alias("n_events"),
        F.sum("__sv").cast("double").alias("sum_value"),
    )


def _reservoir_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-k deterministic "reservoir": k smallest content hashes,
    # executed as TakeOrdered (no full sort)
    from skylinemapreducehadoop_spark.operators.sampling import reservoir_sample

    docs = load_table(spark, sf_dir, "documents")
    return reservoir_sample(docs, 50, ["text"]).select("doc_id")


def _hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic content-hash train/val/test split (80/10/10) — the
    # standard leakage-safe way to split a corpus: same doc text always
    # lands in the same split on any engine (md5-based, no RNG)
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(TX.doc_fingerprint("text"), F.lit(100))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), TX.token_count("text").alias("n_tok"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


def _term_doc_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # document frequency (docs containing the term), the IDF numerator
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.array_distinct(TX.tokens("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "token")
        .limit(20)
    )


def _funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conversion funnel: users whose first view precedes their first
    # click precedes their first purchase
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


def _ngram_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition signal: total vs distinct word 3-grams
    # (integer outputs — engine-exact). TX.ngrams binds the token array
    # once per row (the inlined-transform version re-tokenized per gram
    # position); the alias barrier keeps the gram array computed once
    # for both size() references.
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", TX.ngrams("text", 3).alias("__g"))
    return g.select(
        "doc_id",
        F.size("__g").cast("long").alias("n_3grams"),
        F.size(F.array_distinct("__g")).cast("long").alias("n_distinct_3grams"),
    )


def _repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C4/Gopher "most common n-gram" curation signal: per-doc bigram
    # totals plus the dominant bigram via a distributed two-level
    # aggregate (explode → (doc,gram) count → per-doc struct-max).
    docs = load_table(spark, sf_dir, "documents")
    return TX.repetition_stats(docs, k=2)


def _redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII scrub over text with match counts. The synthetic corpus has
    # no organic PII, so deterministic PII is PLANTED inside the query
    # (same expression in the oracle) — a 0-match run would be a
    # vacuous check, not a passing one.
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            )
            .when(F.col("doc_id") % 5 == 1, F.lit(" call 555-123-4567 today"))
            .when(
                F.col("doc_id") % 5 == 2,
                F.concat(F.lit(" host 10.0.0."), (F.col("doc_id") % 250).cast("string")),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return TX.redact_pii(planted)


def _jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the JSONL sink+source end-to-end: parquet → jsonl on
    # disk → schema'd read-back; the oracle reads the original parquet,
    # so any loss/corruption in the round trip breaks the hash
    import hashlib

    from skylinemapreducehadoop_spark.sources.sinks import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    path = f"/tmp/jsonl_docs_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    write_jsonl(
        docs.select("doc_id", "text", "lang", "source", "n_chars"), path, mode="overwrite"
    )
    back = read_jsonl(
        spark, path,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.select(
        "doc_id", "lang", "n_chars", F.length("text").cast("long").alias("text_len")
    )


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pairwise near-dups → duplicate CLUSTERS (connected components via
    # distributed hash-min label propagation); cluster_id = min doc_id
    # doubles as the deterministic keep-representative
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup(docs, threshold=0.5)
    return D.dedup_clusters(pairs)


def _dedup_star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the same pair graph resolved by large-star/small-star (O(log n)
    # alternations — the long-chain-safe variant); labels must equal
    # hash-min's, so the oracle is the identical recursive-CTE closure
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup(docs, threshold=0.5)
    return D.dedup_clusters(pairs, algorithm="star")


def _semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


def _above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scalar-subquery pattern: compare against the global mean without a
    # lossy decimal division — o_totalprice*n > total  <=>  price > total/n.
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("tot"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
    )
    return (
        orders.join(F.broadcast(stats))
        .where(F.col("o_totalprice").cast("decimal(12,2)") * F.col("n") > F.col("tot"))
        .select("o_orderkey", "o_totalprice")
    )


# GPT-2-style pre-tokenizer, restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): contractions, letter runs, digit runs,
# punctuation runs, whitespace runs. Whitespace uses the PINNED explicit
# class, not \s — Java's \s includes \x0B, RE2's does not (the r11
# driver-red divergence class; see functions/text.py PINNED_WS_CHARS).
_BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    + f"| ?[^A-Za-z0-9{TX.PINNED_WS_CHARS}']+|[{TX.PINNED_WS_CHARS}]+"
)


def _token_bpe_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN)).alias("n_bpe_tokens"),
    )


def _percentile_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact percentiles: Spark's percentile() and DuckDB's quantile_cont
    # share the linear-interpolation definition, bit-identical on doubles
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
    )


def _cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .cube("event_type", "hour_of_day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _explode_tokens_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


def _string_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # head_upper is the PINNED ASCII-only uppercase (Spark's native
    # upper() is full Unicode mapping — 'ß' -> 'SS' — while DuckDB's
    # is simple — 'ß' -> 'ẞ'); head_rev pins CODEPOINT reverse (the
    # Spark/Java definition; the oracle reproduces it by splitting to
    # codepoints, since DuckDB's native reverse() is grapheme-aware)
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 20)
    return docs.select(
        "doc_id",
        TX.ascii_upper(head).alias("head_upper"),
        F.reverse(head).alias("head_rev"),
        F.levenshtein(head, F.lit("the quick brown fox")).alias("lev_dist"),
    )


def _curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the end-to-end training-data pipeline in one plan:
    # quality filter -> exact dedup (keep min doc_id) -> token stats
    docs = load_table(spark, sf_dir, "documents")
    flags = TX.quality_flags(docs).where(F.col("quality_ok")).select(
        "doc_id", "n_tokens"
    )
    # dedup equality on the FULL 128-bit md5 (60 bits would birthday-
    # collide at 10^10 docs); the projected fingerprint stays 60-bit
    fps = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("__md5"))
    qual = flags.join(fps, "doc_id")
    keep = qual.groupBy("__md5").agg(F.min("doc_id").alias("doc_id"))
    return keep.join(qual, ["doc_id", "__md5"]).select(
        "doc_id",
        F.conv(F.substring("__md5", 1, 15), 16, 10).cast("long").alias("fingerprint"),
        "n_tokens",
    )


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sliding-window token chunking (64-token chunks, 16 overlap) — the
    # context-window packing step; zero-UDF sequence/slice/posexplode
    docs = load_table(spark, sf_dir, "documents")
    return TX.chunk_documents(docs, size=64, overlap=16)


def _token_entropy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc Shannon entropy over token counts; the fold runs over the
    # SORTED count list so the fp sum is layout- and engine-exact
    docs = load_table(spark, sf_dir, "documents")
    return TX.token_entropy(docs)


def _mix_corpus_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus mixing: downsample 5 sources to 4:3:2:2:1 target
    # proportions via integer-exact hash thresholds
    from skylinemapreducehadoop_spark.operators.sampling import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 4, "src1": 3, "src2": 2, "src3": 2, "src4": 1}
    return mix_corpus(docs, weights).select("doc_id", "source")


def _decontaminate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n-gram benchmark-overlap decontamination: docs with doc_id%10==0
    # stand in for the eval suite; planted near-duplicates in the
    # corpus guarantee non-zero overlap so the check is non-vacuous
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    evald = docs.where(F.col("doc_id") % 10 != 0)
    return D.contamination_check(evald, bench, k=5)


def _decontaminate_fuzzy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fuzzy decontamination: the "eval suite" is every 50th document
    # PERTURBED by a one-token prefix ("zz "), so no exact match exists
    # but the shingle Jaccard vs the source doc stays ~(n-2)/(n-1) —
    # exactly the lightly-edited leakage the exact k-gram check
    # undercounts. Above-threshold pairs are deterministic (LSH recall
    # 1.0 at 0.5 with these bands — the minhash oracle proves it);
    # sub-threshold pairs are contractually excluded from the output.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.lit("zz "), F.col("text")).alias("text"),
    )
    return D.contamination_check_fuzzy(docs, bench, threshold=0.5)


def _topk_batch_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # batched exact retrieval: top-10 neighbors for the first 10
    # vectors in one pass (per-partition top-k keeps the shuffle tiny)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.cosine_topk_batch(emb, queries, k=10)


def _knn_graph_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-as-queries exact kNN graph: top-5 neighbors for EVERY
    # vector, fully distributed (no driver collect of either side);
    # small blocks so the cogrouped block-pair merge path is exercised
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_graph(emb, k=5, q_block_rows=256, c_block_rows=256)


def _streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the streaming family's first driver-checked entry: replay the
    # documents table through streaming_exact_dedup with availableNow
    # and return the final (batch-queryable) result. Determinism: the
    # source is rewritten as ONE doc_id-sorted parquet file, so
    # "first occurrence" = min doc_id per distinct content and the
    # survivor set is exactly what the batch oracle computes.
    import os
    import tempfile
    import uuid

    from skylinemapreducehadoop_spark.streaming.dedup import streaming_exact_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_dedup_replay_")
    src = os.path.join(tmp, "src")
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    ded = streaming_exact_dedup(
        stream.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))),
        text_col="text",
        ts_col="ts",
        watermark="1 hour",
    )
    qname = f"stream_dedup_replay_{uuid.uuid4().hex[:8]}"
    q = (
        ded.select("doc_id", "fingerprint")
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming replay did not finish within 600s")
    return spark.table(qname)


def _replay_dir(spark: SparkSession, df: DataFrame, prefix: str) -> str:
    # one sorted single-file parquet source for availableNow replays
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(tmp, "src")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    return tmp


def _run_replay(
    stream_df: DataFrame, ckpt_root: str, mode: str = "append"
) -> "DataFrame":
    import os
    import uuid

    spark = stream_df.sparkSession
    qname = f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(ckpt_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming replay did not finish within 600s")
    return spark.table(qname)


def _streaming_skyline_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the engine's headline operator through the STREAMING surface:
    # incremental per-key skyline (applyInPandasWithState) replayed over
    # the events table; the final state explodes to exactly the batch
    # per-group skyline (order-independent, so the replay is
    # deterministic), oracled by the per-group dominance SQL. ts rides
    # as epoch micros (double-exact below 2^53).
    from skylinemapreducehadoop_spark.streaming.incremental import (
        incremental_skyline,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    tmp = _replay_dir(spark, ev, "stream_sky_replay_")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .parquet(tmp + "/src")
        .withColumn("ts_us", F.unix_micros("ts").cast("double"))
    )
    sky = incremental_skyline(
        stream, [("value", "max"), ("ts_us", "min")], key_col="event_type"
    )
    out = _run_replay(sky, tmp, mode="update")
    vec = F.explode("skyline").alias("vec")
    return out.select("key", vec).select(
        F.col("key").alias("event_type"),
        F.col("vec")[0].alias("value"),
        F.col("vec")[1].alias("ts_us"),
    )


def _streaming_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # native session_window replay (5th driver-checked streaming
    # entry): complete-mode availableNow emits every session (open or
    # watermark-closed), and gap-merge is order-independent, so the
    # final session set is deterministic and hash-matches the batch
    # islands SQL. Spark merges an event iff it lands STRICTLY inside
    # the previous window (ts - prev < gap), hence the oracle's
    # >= 1800s new-session predicate.
    from skylinemapreducehadoop_spark.streaming.incremental import session_rollup

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    tmp = _replay_dir(spark, ev, "stream_sess_replay_")
    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(
        tmp + "/src"
    )
    out = session_rollup(stream, gap="30 minutes", watermark="1 hour")
    res = _run_replay(out, tmp, mode="complete")
    return res.select("session_start", "session_end", "user_id", "n_events")


def _streaming_rollup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # watermarked tumbling-window rollup replay (7th driver-checked
    # streaming entry). value rides as DECIMAL through the windowed
    # sum — float partial-sum order varies with the state store's
    # merge order, decimal addition doesn't — then casts to double at
    # the edge, exactly like the batch twin (same oracle).
    from skylinemapreducehadoop_spark.streaming.incremental import hourly_rollup

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    tmp = _replay_dir(spark, ev, "stream_rollup_replay_")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .parquet(tmp + "/src")
        .withColumn("value", F.col("value").cast("decimal(20,4)"))
    )
    out = hourly_rollup(stream, window="1 hour", watermark="1 hour")
    res = _run_replay(out, tmp, mode="complete")
    return res.select(
        F.col("window_start").alias("hour_start"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


def _streaming_moments_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stateful EXACT running moments replay (8th driver-checked
    # streaming entry): per-type (n, Σq, Σq²) on the integer grid —
    # state is three integers, the fold is exact, so the FINAL state
    # equals the batch aggregate no matter how the stream is batched.
    # Big sums ride as decimal strings (Σq² exceeds int64 at scale);
    # update mode emits one row per key per batch, the max-n row per
    # key is the final state.
    from skylinemapreducehadoop_spark.streaming.incremental import (
        streaming_group_moments,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    tmp = _replay_dir(spark, ev, "stream_moments_replay_")
    stream = spark.readStream.schema("event_type string, value double").parquet(
        tmp + "/src"
    )
    out = streaming_group_moments(stream)
    res = _run_replay(out, tmp, mode="update")
    final = res.groupBy("key").agg(
        F.max(F.struct("n", "s", "sxx")).alias("__f")
    )
    return final.select(
        F.col("key").alias("event_type"),
        F.col("__f.n").alias("n"),
        F.col("__f.s").alias("sum_q"),
        F.col("__f.sxx").alias("sumsq_q"),
    ).orderBy("event_type")


def _streaming_enrich_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-static enrichment replay (6th driver-checked streaming
    # entry): the fact stream joins a broadcast dim table map-side per
    # micro-batch (stateless — no watermark needed), so the replayed
    # row set equals the batch join exactly
    from skylinemapreducehadoop_spark.streaming.incremental import enrich_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tmp = _replay_dir(spark, ev, "stream_enrich_replay_")
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .parquet(tmp + "/src")
        .withColumn("n_nationkey", F.pmod(F.col("user_id"), F.lit(25)))
    )
    out = enrich_stream(stream, nation, on="n_nationkey", how="inner")
    return _run_replay(out.select("event_id", "user_id", "n_name"), tmp)


def _streaming_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-stream interval join replay — the operator whose state
    # eviction was fixed in r6 (interval arithmetic on watermarked
    # columns); inner-join pair sets are order-independent, so the
    # replay hash-matches the batch range-join oracle
    from skylinemapreducehadoop_spark.streaming.joins import interval_join_streams

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    tmp = _replay_dir(spark, ev, "stream_ivj_replay_")
    schema = "user_id bigint, ts timestamp, event_id bigint"
    left = spark.readStream.schema(schema).parquet(tmp + "/src")
    right = spark.readStream.schema(schema).parquet(tmp + "/src")
    joined = interval_join_streams(
        left,
        right,
        on="user_id",
        lower_seconds=0,
        upper_seconds=300,
        watermark="24 hours",
    )
    out = _run_replay(
        joined.select(
            "user_id", "event_id", F.col("event_id_r").alias("event_id_after")
        ),
        tmp,
    )
    return out


def _streaming_near_dup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental MinHash-LSH index replay (the last streaming surface
    # without a driver row, r6 brief item 6): the corpus streams in as
    # FOUR deterministic waves (doc_id mod 4), so both the intra-batch
    # self-join AND the batch-vs-store candidate paths execute; the
    # accumulated pair set is order-independent and equals the batch
    # operator's, so it hash-matches the exact-Jaccard oracle
    import os
    import tempfile

    from skylinemapreducehadoop_spark.streaming.dedup import streaming_near_dup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_neardup_replay_")
    src = os.path.join(tmp, "src")
    for i in range(4):
        docs.where(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_near_dup(
        stream,
        os.path.join(tmp, "store"),
        os.path.join(tmp, "pairs"),
        os.path.join(tmp, "ckpt"),
        threshold=0.5,
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("streaming replay did not finish within 600s")
    return spark.read.parquet(os.path.join(tmp, "pairs")).select(
        "id_a", "id_b", "jaccard"
    )


def _skyline_sql_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SKYLINE OF SQL surface (Börzsönyi et al. ICDE'01; promised by
    # the reference's Readme.md:3-4 but never shipped there): string
    # rewrite -> spark.sql core -> operator library; same oracle as the
    # function-API skyline queries
    from skylinemapreducehadoop_spark.sql import skyline_sql

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return skyline_sql(
        spark,
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, "
        "l_quantity FROM lineitem "
        "SKYLINE OF l_extendedprice MIN, l_discount MIN, l_quantity MAX",
    )


def _dynamic_skyline_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dellis & Seeger's dynamic skyline at the same query point the
    # reverse skyline uses: rows Pareto-minimal in |x - q| space
    from skylinemapreducehadoop_spark.operators.reverse import dynamic_skyline

    part = load_table(spark, sf_dir, "part")
    return dynamic_skyline(part, ["p_retailprice", "p_size"], (960.0, 20.0)).select(
        "p_partkey", "p_retailprice", "p_size"
    )


def _pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence packing: docs → fixed-token-budget training packs,
    # sharded so the packing window parallelizes
    docs = load_table(spark, sf_dir, "documents")
    return TX.pack_sequences(docs, budget=512, n_shards=8)


def _unigram_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-unigram LM scoring (perplexity-filter proxy); integer-arg
    # log2 + sorted fold keep the doubles engine-exact
    docs = load_table(spark, sf_dir, "documents")
    return TX.unigram_logprob(docs)


def _bigram_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # add-one-smoothed corpus-bigram LM scoring — the next rung of the
    # perplexity-filter ladder; same integer-arg-log2 + sorted-fold
    # exactness rules as the unigram scorer
    docs = load_table(spark, sf_dir, "documents")
    return TX.bigram_logprob(docs)


def _approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quantile sketch (Greenwald-Khanna summaries, the mergeable
    # map-side-combinable path): approximate by design, so rows-only
    # check; tests/test_sketches.py bounds the rank error vs the exact
    # interpolated percentile next to it (percentile_value_by_type)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("ap90"),
    )


def _approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog sketch — approximate by design, so rows-only check;
    # tests/test_sketches.py bounds the error vs the exact count
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


def _approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived DETERMINISTIC check for the HLL sketch (the ANN-recall
    # pattern): HLL registers max-merge, so the estimate is a pure
    # function of the value SET — partitioning-independent — and the
    # in-bound boolean is hashable. The oracle derives exact_users
    # from the data and asserts the bound; a broken sketch breaks the
    # hash. Bound: 5x the configured 1% rsd, floor of 2.
    ev = load_table(spark, sf_dir, "events")
    appr = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("a")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        appr.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("a") - F.col("exact_users"))
                <= F.greatest(
                    F.ceil(F.col("exact_users") * F.lit(0.05)), F.lit(2)
                )
            ).alias("within_bound"),
        )
    )


def _approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # derived DETERMINISTIC check for the Greenwald-Khanna quantile
    # sketch: the returned value's true rank interval [lt+1, le] must
    # cover the target rank within tol = n/1000 + 1 (10x the
    # configured n/10000 guarantee — loose enough to be invariant for
    # a healthy sketch, tight enough that a broken one misses). The
    # oracle derives n from the data and asserts both booleans.
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ap = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("a90"),
    )
    j = ev.join(F.broadcast(ap), "event_type")
    agg = j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a90")).cast("long")).alias("lt90"),
        F.sum((F.col("value") <= F.col("a90")).cast("long")).alias("le90"),
    )
    tol = F.col("n") / 1000.0 + 1.0

    def ok(lt, le, p):
        target = F.col("n") * F.lit(p)
        return (F.col(lt) + 1 <= target + tol) & (F.col(le) >= target - tol)

    return agg.select(
        "event_type",
        "n",
        ok("lt50", "le50", 0.5).alias("ok50"),
        ok("lt90", "le90", 0.9).alias("ok90"),
    )


# ---------------------------------------------------------------------------
# round-8 additions: engine-exact distributed statistics, triangle
# counting, BM25 retrieval, Markov transitions


def _linreg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-pass least squares l_extendedprice ~ l_quantity via exact
    # decimal normal equations (operators/stats.py); prices quantized
    # to cents, quantities integer-valued already
    from skylinemapreducehadoop_spark.operators.stats import linear_fit

    li = load_table(spark, sf_dir, "lineitem")
    return linear_fit(li, "l_quantity", "l_extendedprice", x_scale=1, y_scale=100)


def _corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full pairwise Pearson matrix in ONE hash aggregate (all 9 moments
    # in the same pass); exact decimal sums make the floats engine-exact
    from skylinemapreducehadoop_spark.operators.stats import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(
        li,
        ["l_quantity", "l_extendedprice", "l_discount"],
        scales=[1, 100, 100],
    )


def _zscore_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type 3-sigma outlier counts decided in EXACT integer
    # arithmetic ((n*x-S)^2 > 9*(n*Sxx-S^2)) — a float z-score filter
    # could flip at the boundary and never hash-match
    from skylinemapreducehadoop_spark.operators.stats import zscore_outliers

    ev = load_table(spark, sf_dir, "events")
    return zscore_outliers(ev, "value", "event_type").orderBy("event_type")


def _triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triangles of the co-purchase graph (parts sharing an order) via
    # degree-ordered wedge closure; the oracle counts the same triangles
    # with a direct a<b<c triple join — two independent formulations
    from skylinemapreducehadoop_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    return triangle_count(edges)


_BM25_TERMS = ["hash", "merge", "spark", "window"]


def _bm25_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BM25 top-20 for a fixed bag-of-words query; integer-arg log2 idf +
    # sorted fold + rounded-score ranking keep rank order engine-exact
    from skylinemapreducehadoop_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    top = bm25_topk(docs, _BM25_TERMS, k=20)
    return top.select(F.col("id").alias("doc_id"), "n_terms_hit", "score")


def _table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # snapshot reconciliation: orders vs a deterministically perturbed
    # copy (drop every 97th key, bump totalprice on every 31st, add
    # shifted-key rows for every 53rd) — the diff summary must account
    # for every key exactly
    from skylinemapreducehadoop_spark.operators.diff import table_diff_summary

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    newer = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 53 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return table_diff_summary(o, newer, ["o_orderkey"])


def _clustering_coefficient_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global clustering coefficient of the co-purchase graph: exact
    # integer triangle/wedge counts, one engine-exact final division
    from skylinemapreducehadoop_spark.operators.graph import clustering_coefficient

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )
    return clustering_coefficient(edges)


def _frequent_pairs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # market-basket frequent pairs over order baskets (support + lift)
    from skylinemapreducehadoop_spark.operators.stats import frequent_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return frequent_pairs(li, "l_orderkey", "l_partkey", min_support=2, k=50)


def _bpe_merges_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distributed BPE tokenizer training on a planted word-frequency
    # corpus (the Sennrich et al. ACL'16 classroom example) — the merge
    # sequence is analytically determined (ties broken by (left,
    # right)), so the iterative loop gets a REAL oracle row set (the
    # pagerank_cycle_check pattern for iterative operators)
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    text = " ".join(w for w, f in words for _ in range(f))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = TX.bpe_train(df, n_merges=10)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count int"
    )


def _bpe_encode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the ENCODE half of the tokenizer (bpe_merges_check covers train):
    # a fixed 5-merge table applied to 6 planted words — the token
    # sequences are analytically determined (rank-order replay,
    # left-to-right non-overlapping), so the Arrow-batched apply UDF
    # gets a real known-answer oracle row set. Map-only at any scale
    # (no Exchange in the plan — asserted in tests/test_bpe_encode.py).
    table = [(0, "l", "o", 9), (1, "lo", "w", 8), (2, "e", "r", 7),
             (3, "er", "</w>", 6), (4, "n", "e", 5)]
    words = ["low", "lower", "lowest", "newer", "wider", "new"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    from skylinemapreducehadoop_spark.functions.text import bpe_encode

    return (
        bpe_encode(df, table, text_col="word")
        .select("word", F.array_join("bpe_tokens", " ").alias("encoded"))
    )


def _pmi_collocations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top collocations by PMI (sum-of-integer-arg-log2 form, so the
    # doubles are engine-exact; ties rank by pair)
    docs = load_table(spark, sf_dir, "documents")
    return TX.pmi_collocations(docs, min_count=5, k=50)


def _bm25_index_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SAME query through the persisted inverted index (build-once /
    # probe-many, cached under the source fingerprint like the IVF
    # index): probe(index(docs)) must hash-match the direct operator's
    # oracle — the partition-pruned access path changes, the answer
    # cannot
    import hashlib
    import tempfile

    from skylinemapreducehadoop_spark.operators.retrieval import (
        bm25_probe,
        build_text_index,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nofp"
    # v2: stats carry n_buckets (probe reads the modulus back)
    tag = hashlib.md5(f"{sf_dir}|{fp}|text_index_v2".encode()).hexdigest()[:10]
    idx_path = os.path.join(tempfile.gettempdir(), f"text_index_{tag}")
    if not os.path.exists(os.path.join(idx_path, "postings", "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        build_text_index(docs, idx_path)
    top = bm25_probe(spark, idx_path, _BM25_TERMS, k=20)
    return top.select(F.col("id").alias("doc_id"), "n_terms_hit", "score")


def _event_transitions_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first-order Markov transition matrix of per-user event sequences;
    # (ts, event_id) ordering makes simultaneous events deterministic
    from skylinemapreducehadoop_spark.operators.temporal import event_transitions

    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev).orderBy("from_type", "to_type")


def _tfidf_keywords_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-3 TF-IDF keywords per document (keyword extraction / doc
    # tagging); integer-arg log2 + round(6) + rank-on-rounded-score =
    # the repo's engine-exact scoring rules, so the oracle is exact
    from skylinemapreducehadoop_spark.functions.text import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        tfidf_keywords(docs, k=3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank")
    )


def _max_concurrency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sweep-line peak concurrency per event type (capacity planning):
    # each event opens an interval of (1 + event_id % 5) minutes;
    # end-exclusive overlap, exact integer microsecond arithmetic
    from skylinemapreducehadoop_spark.operators.temporal import interval_concurrency

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.unix_micros("ts").alias("start_us"),
        (
            F.unix_micros("ts")
            + F.lit(60_000_000) * (F.lit(1) + F.col("event_id") % 5)
        ).alias("end_us"),
    )
    return interval_concurrency(iv, by="event_type").orderBy("event_type")


def _incremental_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # steady-state ingestion dedup: the batch (doc_id % 10 == 0) is
    # cleaned against the standing corpus (the rest) + its own internal
    # duplicates; only 16-byte md5 keys ever shuffle
    from skylinemapreducehadoop_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    return incremental_dedup(corpus, batch).select("doc_id").orderBy("doc_id")


def _frame_sample_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # frame-sampling plumbing with a REAL oracle: WAV payloads have a
    # closed-form byte length (44 + 2*n_samples), so the every-3rd-
    # frame fan-out and each frame's byte count are analytically
    # derivable from doc_id alone — any drift in the synthesizer, the
    # stride explode or the binary substring breaks the hash
    from skylinemapreducehadoop_spark.operators.multimodal import (
        sample_frames,
        synthesize_media_column,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("wav").alias("__k"),
        (1 + F.col("doc_id") % 64).cast("int").alias("__w"),
        F.lit(1).cast("int").alias("__h"),
        (1 + (F.col("doc_id") % 97) * 16).cast("int").alias("__n"),
    )
    media = synthesize_media_column(docs, "__k", "__w", "__h", wav_samples_col="__n")
    frames = sample_frames(media, every_n=3)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame_bytes").alias("frame_len"),
    ).orderBy("doc_id", "frame_idx")


def _duplicate_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # maximal duplicated 8-gram spans (the span-level diagnostic of
    # ACL'22 exact-substring dedup): only 128-bit gram hashes shuffle;
    # interval merge = one per-doc window, no position self-join
    from skylinemapreducehadoop_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        duplicate_spans(docs, n=8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "span_start")
    )


def _streaming_drift_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 9th streaming driver entry: watermarked per-hour value histograms
    # (the streaming half of drift monitoring — windowed_histogram),
    # replayed availableNow; the per-window PSI vs the all-time
    # distribution is a tiny batch decoration on the histogram frame
    # (Laplace-smoothed integer counts, integer-arg log2 — the
    # distribution_drift exactness rules)
    from skylinemapreducehadoop_spark.streaming.incremental import windowed_histogram

    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "value")
        .where(F.col("value").isNotNull())
    )
    tmp = _replay_dir(spark, ev, "stream_drift_replay_")
    stream = spark.readStream.schema("ts timestamp, value double").parquet(
        tmp + "/src"
    )
    hist = windowed_histogram(stream, lo=0.0, hi=500.0, n_buckets=10)
    # pin the (windows x buckets)-sized result: the PSI decoration
    # self-joins it three ways, and a memory-sink table re-referenced
    # in its own join trips conflicting-reference resolution
    res = _run_replay(hist, tmp, mode="complete").localCheckpoint(eager=True)
    total = res.groupBy("bucket").agg(F.sum("n").alias("n_all"))
    wt = res.groupBy("window_start").agg(F.sum("n").alias("__w"))
    gt = res.agg(F.sum("n").alias("__t"))
    from skylinemapreducehadoop_spark.operators.stats import psi_log_term

    B = 10
    p = (F.col("n") + 1).cast("double") / (F.col("__w") + B).cast("double")
    q = (F.col("n_all") + 1).cast("double") / (F.col("__t") + B).cast("double")
    # sum-of-single-integer-arg log2s — no count product, no overflow
    term = (p - q) * psi_log_term(
        F.col("n") + 1, F.col("__t") + B, F.col("n_all") + 1, F.col("__w") + B
    )
    return (
        res.join(total, "bucket")
        .join(wt, "window_start")
        .crossJoin(F.broadcast(gt))
        .select(
            F.col("window_start").alias("hour_start"),
            "bucket",
            "n",
            F.round(term, 6).alias("psi_term"),
        )
        .orderBy("hour_start", "bucket")
    )


def _quantize_check_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # int8 embedding quantization with the reconstruction-error bound
    # asserted per row; scale/qvec are a fixed IEEE sequence on the
    # float32-exact doubles, so the oracle reproduces them bit-for-bit.
    # qvec is pinned via integer signatures (sum / L1 / max) instead of
    # the raw array — the hash comparator's row sort cannot order
    # array cells
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.quantize_roundtrip_check(emb)
    zero = F.lit(0).cast("long")
    return out.select(
        F.col("id").alias("vec_id"),
        "scale",
        F.aggregate("qvec", zero, lambda a, q: a + q).alias("q_sum"),
        F.aggregate("qvec", zero, lambda a, q: a + F.abs(q)).alias("q_l1"),
        F.array_max("qvec").alias("q_max"),
        "err_ok",
    ).orderBy("vec_id")


def _quantized_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # recall@10 of cosine ranking over RECONSTRUCTED (int8-dequantized)
    # vectors vs the exact-cosine ranking — the derived oracle row for
    # the compression family (the ann_recall pattern): quantization is
    # deterministic, so both rankings and their overlap hash exactly
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    # quantize the query driver-side with the same formula
    amax = max(abs(float(x)) for x in qv)
    s = amax / 127.0
    import math

    rq = (
        [min(127, max(-127, math.floor(float(x) / s + 0.5))) * s for x in qv]
        if s > 0
        else [0.0 for _ in qv]
    )
    # rank on ROUNDED scores (6 digits) in both engines — raw BLAS vs
    # sequential-fold cosines can differ in final ulps, and rank
    # membership at the k boundary must not hinge on them
    exact = S.cosine_topk(corpus, qv, k=10, round_digits=6).select("vec_id")
    recon = S._quantized(corpus, "vec_id", "embedding").select(
        F.col("id").alias("vec_id"),
        S.dequantize_col("qvec", "scale").alias("rvec"),
    )
    approx = S.cosine_topk(recon, rq, k=10, vec_col="rvec", round_digits=6).select(
        "vec_id"
    )
    both = exact.intersect(approx)
    return both.agg(F.count(F.lit(1)).alias("n_overlap")).select(
        "n_overlap", F.round(F.col("n_overlap") / F.lit(10.0), 6).alias("recall")
    )


def _zorder_scan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Z-order layout path driven end-to-end through the driver
    # contract: a build-once Morton-clustered rewrite of lineitem, then
    # a 2-D range scan whose ROWS must equal the plain table's — layout
    # must never change results (row-group skipping itself is proven by
    # the scan-metrics pytest). Rewrite cached on the source fingerprint.
    import hashlib
    import tempfile

    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        fp = "nofp"
    tag = hashlib.md5(f"{sf_dir}|{fp}|zorder_v1".encode()).hexdigest()[:10]
    zpath = os.path.join(tempfile.gettempdir(), f"zorder_lineitem_{tag}")
    if not os.path.exists(os.path.join(zpath, "_SUCCESS")):
        from skylinemapreducehadoop_spark.sources.layout import write_zordered

        li = load_table(spark, sf_dir, "lineitem")
        write_zordered(li, zpath, "l_extendedprice", "l_quantity", n_files=8)
    z = spark.read.parquet(zpath)
    return (
        z.where(
            (F.col("l_extendedprice") >= 20000)
            & (F.col("l_extendedprice") < 30000)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") < 20)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def _weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Efraimidis-Spirakis weighted sample (inclusion ∝ n_chars) — the
    # importance-sampling step of corpus curation, RNG-free so the
    # oracle draws the IDENTICAL rows from the same md5 grid
    from skylinemapreducehadoop_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    out = weighted_sample(docs, 50, "n_chars", ["text"], tiebreak_cols=["doc_id"])
    return out.select("doc_id", "n_chars").orderBy("doc_id")


def _zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zipf's-law fit of the corpus token-frequency distribution:
    # regress log2(freq) on log2(rank) over the top 200 ranks — slope
    # ≈ -alpha. Pure operator COMPOSITION: tokens explode+agg, a
    # TakeOrdered top-200 (never a global vocab sort; the rank window
    # runs on the bounded 200-row frame), then the engine-exact
    # decimal-moment linear_fit
    from pyspark.sql import Window

    from skylinemapreducehadoop_spark.functions.text import tokens
    from skylinemapreducehadoop_spark.operators.stats import linear_fit

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    top = tf.orderBy(F.col("cnt").desc(), "tok").limit(200)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok"))
    )
    pts = ranked.select(
        F.log2(F.col("rank").cast("double")).alias("lx"),
        F.log2(F.col("cnt").cast("double")).alias("ly"),
    )
    return linear_fit(pts, "lx", "ly", x_scale=1_000_000, y_scale=1_000_000)


def _distribution_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PSI-style distribution drift between two order snapshots over
    # fixed equal-width price buckets; Laplace-smoothed integer counts
    # keep every log2 argument an integer (engine-exact)
    from skylinemapreducehadoop_spark.operators.stats import distribution_drift

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 4 != 0)
    cur = orders.where(F.col("o_orderkey") % 4 == 0)
    return distribution_drift(
        base, cur, "o_totalprice", lo=0.0, hi=600000.0, n_buckets=10
    )



def _boilerplate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/RefinedWeb line-frequency boilerplate detection over
    # aligned 8-token segments, with a PLANTED banner fixture: every
    # 10th doc re-appears (doc_id+700000) behind a fixed 8-token
    # banner, which detection must flag alongside the corpus's natural
    # cross-doc repeats
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(F.lit(_BANNER + " "), F.col("text")).alias("text"),
    )
    return D.boilerplate_segments(
        docs.unionByName(planted), width=8, min_docs=3
    ).orderBy("segment")


def _strip_boilerplate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the strip half of the boilerplate pass on the same planted
    # corpus: per-doc segment/flag counts plus the rebuilt text's md5
    # (hashing keeps the compared payload small; rebuild order is
    # position-deterministic)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(F.lit(_BANNER + " "), F.col("text")).alias("text"),
    )
    out = D.strip_boilerplate(docs.unionByName(planted), width=8, min_docs=3)
    return out.where(F.col("n_flagged") > 0).select(
        "doc_id",
        "n_segments",
        "n_flagged",
        F.md5(F.col("clean_text")).alias("clean_md5"),
    ).orderBy("doc_id")


def _gini_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-priority revenue concentration: exact integer Gini on the
    # cents grid (stats.gini_by — value-aggregated closed form, no
    # per-row ranking)
    from skylinemapreducehadoop_spark.operators.stats import gini_by

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return gini_by(o, "o_orderpriority", "cents").orderBy("o_orderpriority")


def _ewma_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # monthly revenue per priority smoothed by the exact truncated
    # EWMA (temporal.ewma_smooth — integer lag weights 7^k*10^(11-k),
    # one window pass)
    from skylinemapreducehadoop_spark.operators.temporal import ewma_smooth

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    monthly = o.groupBy("o_orderpriority", "month").agg(
        F.sum("cents").alias("revenue_cents")
    )
    return ewma_smooth(
        monthly, "o_orderpriority", "month", "revenue_cents", round_digits=4
    ).orderBy("o_orderpriority", "month")


def _auc_purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # quality-classifier evaluation shape: exact Mann-Whitney ROC-AUC
    # of the event value "score" against the purchase label, via the
    # distributed prefix sum (stats.roc_auc — no global window)
    from skylinemapreducehadoop_spark.operators.stats import roc_auc

    ev = load_table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("is_purchase")
    )
    return roc_auc(ev, "value", "is_purchase")


def _chi2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dataset-bias screen: chi-square contingency cells of event type
    # vs ISO weekday — exact integer deviations, one pinned division
    # per cell (stats.chi2_independence)
    from skylinemapreducehadoop_spark.operators.stats import chi2_independence

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    return chi2_independence(ev, "event_type", "dow")



def _survival_km_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Kaplan-Meier time-to-purchase per first-event cohort: duration =
    # days from a user's first event to their first purchase (event=1)
    # or to their last observed event (censored); the cumulative
    # product runs as an order-free rounded-log decimal sum
    # (stats.survival_km)
    from skylinemapreducehadoop_spark.operators.stats import survival_km

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", F.to_date("ts").alias("d")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type", "d")).alias("__first"),
        F.max("d").alias("__last_d"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("d"))).alias(
            "__purchase_d"
        ),
    )
    subj = per_user.select(
        F.col("__first.event_type").alias("cohort"),
        F.datediff(
            F.coalesce("__purchase_d", "__last_d"), F.col("__first.d")
        ).alias("duration"),
        F.col("__purchase_d").isNotNull().cast("int").alias("event"),
    )
    return survival_km(subj, "cohort", "duration", "event").orderBy(
        "cohort", "t"
    )


def _benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-significant-digit screen on order totals (cents
    # grid; leading digit via decimal-string substr — no float log10
    # in the bucketing)
    from skylinemapreducehadoop_spark.operators.stats import benford_digits

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return benford_digits(o, "cents")


def _trimmed_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 5%-each-side trimmed mean of order totals per priority, exact on
    # the value-aggregated frame (stats.trimmed_mean); dollars out to
    # respect the round-parity magnitude rule
    from skylinemapreducehadoop_spark.operators.stats import trimmed_mean

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return trimmed_mean(
        o, "o_orderpriority", "cents", trim_num=1, trim_den=20,
        out_scale_den=100, round_digits=6,
    ).orderBy("o_orderpriority")


def _position_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U-shaped multi-touch attribution over per-user journeys
    # (temporal.position_attribution): exact rational credits, one
    # pinned division each
    from skylinemapreducehadoop_spark.operators.temporal import (
        position_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return position_attribution(ev).orderBy(
        "conversion_event_id", "position"
    )


def _mix_diversity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language source-mix diversity: Shannon (order-free rounded
    # decimal fold), Hill-1 effective source count, Gini-Simpson
    # (sampling.mix_diversity)
    from skylinemapreducehadoop_spark.operators.sampling import mix_diversity

    docs = load_table(spark, sf_dir, "documents")
    return mix_diversity(docs, "lang", "source").orderBy("lang")



def _pca_invariant_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PCA correctness via its spectral invariant: the eigenvalues of
    # the engine-computed exact covariance must sum to its trace
    # (total variance). The eigendecomposition is driver-side on the
    # dim x dim collect (similarity.pca_components — the kmeans
    # centroid contract); trace is an exact decimal sum of the
    # engine's round(9) diagonal, so the oracle recomputes it from
    # integer sufficient statistics. Projection-level behavior is
    # pytest-verified (variance of proj_c == eigval_c vs numpy).
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from skylinemapreducehadoop_spark.operators.similarity import covariance_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE distributed covariance pass feeds both sides of the invariant:
    # the dim x dim collect is the kmeans-centroid contract (bounded by
    # dimension, never data). Previously pca_components() ran its own
    # covariance pass + a dim-stats pass and the trace ran a THIRD —
    # same rows collected, 3x the scan/expand cost. Eigenvalues of the
    # symmetrized matrix are identical (same cov values), and dim ==
    # len(means) == max index + 1 on all-same-dim embeddings.
    cov_rows = covariance_matrix(emb).collect()
    if not cov_rows:
        # same descriptive failure pca_components raises — not a bare
        # "max() arg is an empty sequence" (ADVICE r16)
        raise ValueError("pca_invariant_check: no non-null embedding vectors")
    dim = max(r["j"] for r in cov_rows) + 1
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    eigvals = np.linalg.eigvalsh(cov)
    grid = Decimal("0.000001")
    trace = sum(
        Decimal(str(r["cov"])) for r in cov_rows if r["i"] == r["j"]
    ).quantize(grid, rounding=ROUND_HALF_UP)
    eig_sum = Decimal(str(float(eigvals.sum()))).quantize(
        grid, rounding=ROUND_HALF_UP
    )
    return spark.createDataFrame(
        [(int(dim), float(trace), float(eig_sum))],
        "dim int, trace_var double, eig_sum double",
    )


def _l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # privacy screen beyond k-anonymity: how many distinct sensitive
    # values (account-balance band) each (nation, segment) class holds
    from skylinemapreducehadoop_spark.operators.stats import l_diversity

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return l_diversity(c, ["c_nationkey", "c_mktsegment"], "bal_band", l=3)


def _ntile_buckets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global decile binning WITHOUT the NTILE single-partition window:
    # value-based bins over the distributed-prefix-sum CDF
    # (stats.ntile_global)
    from skylinemapreducehadoop_spark.operators.stats import ntile_global

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    return ntile_global(li, "l_extendedprice", n_tiles=10, scale=100)



def _calibration_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the calibration half of classifier evaluation (roc_auc is the
    # ranking half): reliability bins of the deterministic
    # hashing-trick quality score against the English label
    from skylinemapreducehadoop_spark.operators.stats import calibration_bins

    docs = load_table(spark, sf_dir, "documents")
    scored = TX.classifier_score(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("is_en")),
        "doc_id",
    )
    return calibration_bins(scored, "prob", "is_en", n_bins=10)


def _vocab_budget_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenizer planning: smallest frequency-ranked vocab reaching
    # 50/90/95/99% token coverage, on the distributed prefix sum
    # (text.vocab_budget / stats.global_prefix_sum)
    docs = load_table(spark, sf_dir, "documents")
    return TX.vocab_budget(docs).orderBy("target_num")


def _balanced_shards_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # training-shard balancing: striped-LPT assignment over the
    # global_row_number prefix sum; per-shard size summary
    from skylinemapreducehadoop_spark.operators.sampling import balanced_shards

    docs = load_table(spark, sf_dir, "documents")
    return balanced_shards(docs, "n_chars", n_shards=8)



def _normalize_nfc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unicode canonicalization pass with PLANTED decomposed-accent
    # rows (U+0065 U+0301 etc.): every 25th doc re-appears
    # (doc_id+800000) with a decomposed suffix the NFC pass must
    # compose; output = the changed rows' normalized-text md5
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dec_suffix = " cafe" + chr(0x301) + " u" + chr(0x308) + "ber"
    planted = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 800000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(dec_suffix)).alias("text"),
    )
    out = TX.normalize_nfc(docs.unionByName(planted))
    return (
        out.where(F.col("changed"))
        .select("doc_id", F.md5(F.col("clean_text")).alias("clean_md5"))
        .orderBy("doc_id")
    )


def _referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cross-table FK audit over three relations, with planted orphan
    # and NULL child keys proving the counts (the natural data is
    # referentially intact, which a checker must also report honestly)
    from skylinemapreducehadoop_spark.functions.expect import (
        referential_integrity,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("k")
    )
    extra = spark.createDataFrame(
        [(-1,), (-1,), (-2,), (None,)], "k long"
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r1 = referential_integrity(
        li.unionByName(extra), o, "k", "o_orderkey",
        relation="lineitem->orders",
    )
    r2 = referential_integrity(
        o, c, "o_custkey", "c_custkey", relation="orders->customer"
    )
    r3 = referential_integrity(
        c, n, "c_nationkey", "n_nationkey", relation="customer->nation"
    )
    return r1.unionByName(r2).unionByName(r3).orderBy("relation")



def _ks_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact two-sample Kolmogorov-Smirnov between the click and
    # purchase value distributions — the unbinned shift screen next
    # to PSI/chi2 (stats.ks_test, two-measure distributed prefix sum)
    from skylinemapreducehadoop_spark.operators.stats import ks_test

    ev = load_table(spark, sf_dir, "events")
    return ks_test(ev, "event_type", "value", "click", "purchase")


def _mi_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # feature-relevance / leakage screen: MI of three candidate
    # features against the event-type label in ONE melted plan
    # (stats.mutual_info_scan)
    from skylinemapreducehadoop_spark.operators.stats import mutual_info_scan

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        (F.col("user_id") % 10).alias("user_mod"),
        F.floor(F.col("value") / 20).alias("value_band"),
    )
    return mutual_info_scan(
        ev, ["dow", "user_mod", "value_band"], "event_type"
    )



def _image_dhash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # container-robust image near-dup: the SAME closed-form RGB planes
    # rendered as a PNG (doc_id) and as a BMP (doc_id+900000), AND the
    # same block-uniform grayscale mosaic rendered as a gray8 PNG
    # (doc_id+1800000) and as a REAL baseline JPEG (doc_id+2700000,
    # entropy-coded DCT — exact round-trip because every 8x8 block is
    # DC-only at quant=1), must produce IDENTICAL perceptual dHashes
    # while their bytes differ — the oracle recomputes every gradient
    # bit arithmetically from doc_id (multimodal.image_dhash over the
    # exact luma + floor resize; mosaic law in multimodal._mosaic_gray)
    from skylinemapreducehadoop_spark.operators.multimodal import (
        image_dhash,
        synthesize_mosaic_jpeg_column,
        synthesize_mosaic_png_column,
        synthesize_rgb_bmp_column,
        synthesize_rgb_png_column,
    )

    # fan out the id column before the synth+decode Python stages: the
    # single-split documents scan otherwise caps each of the 4 union
    # branches at ONE task, so ~6000 pure-Python encode/decode images
    # ran on 4 cores. par//4 per branch fills the machine without
    # flooding it with near-empty batches; no-op at cluster scale.
    _par = max(1, spark.sparkContext.defaultParallelism // 4)
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(_par)
    png = synthesize_rgb_png_column(docs, "doc_id")
    bmp = synthesize_rgb_bmp_column(
        docs.select((F.col("doc_id") + 900000).alias("doc_id"),
                    (F.col("doc_id")).alias("__k")),
        "__k",
    ).select("doc_id", "media")
    mos_png = synthesize_mosaic_png_column(
        docs.select((F.col("doc_id") + 1800000).alias("doc_id"),
                    (F.col("doc_id")).alias("__k")),
        "__k",
    ).select("doc_id", "media")
    mos_jpg = synthesize_mosaic_jpeg_column(
        docs.select((F.col("doc_id") + 2700000).alias("doc_id"),
                    (F.col("doc_id")).alias("__k")),
        "__k",
    ).select("doc_id", "media")
    both = (
        png.select("doc_id", "media")
        .unionByName(bmp)
        .unionByName(mos_png)
        .unionByName(mos_jpg)
    )
    h = image_dhash(both)
    return (
        h.groupBy("dhash_bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("dhash_bits")
    )



def _leadlag_corr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # does click volume LEAD purchase volume? Pearson corr at lags
    # -3..+3 over the daily series (temporal.leadlag_corr — exact
    # decimal moments, one sqrt+division per lag)
    from skylinemapreducehadoop_spark.operators.temporal import leadlag_corr

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("clicks"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("purchases"),
    )
    return leadlag_corr(daily, "d", "clicks", "purchases", max_lag=3)


def _seasonality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day-of-week seasonal index of order revenue: each weekday's
    # daily average as a share of the overall daily average, ONE
    # pinned division per position (temporal.seasonality_index)
    from skylinemapreducehadoop_spark.operators.temporal import (
        seasonality_index,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return seasonality_index(o, "o_orderdate", "cents", period="dow")


def _seasonality_month_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # month-of-year seasonal index of order revenue ("is December
    # really 2x?"): the period='month' branch of seasonality_index —
    # positions by month 1-12, n_p counts distinct CALENDAR MONTHS
    # ('yyyy-MM' buckets). This branch was corrected in r11
    # (month-bucket granularity, temporal.py:850-855) but only the
    # dow path had a registry entry; this makes the fixed branch
    # driver-checkable (r11 verdict task 7).
    from skylinemapreducehadoop_spark.operators.temporal import (
        seasonality_index,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return seasonality_index(o, "o_orderdate", "cents", period="month")



def _interarrival_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # burstiness screen per event type: exact integer-microsecond gap
    # moments, division-cleared CV^2, Goh-Barabasi burstiness
    # (temporal.interarrival_stats)
    from skylinemapreducehadoop_spark.operators.temporal import (
        interarrival_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return interarrival_stats(ev, "event_type", "ts", "event_id")


def _winsorized_mean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the clamping sibling of trimmed_mean_orders on the same frame:
    # whale orders count once at the 5%-boundary cap
    from skylinemapreducehadoop_spark.operators.stats import winsorized_mean

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return winsorized_mean(
        o, "o_orderpriority", "cents", trim_num=1, trim_den=20,
        out_scale_den=100, round_digits=6,
    ).orderBy("o_orderpriority")



def _theil_sen_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust daily-revenue trend per priority: exact median of all
    # pairwise slopes over the calendar-bounded daily series
    # (temporal.theil_sen_trend — OLS's outlier-immune sibling)
    from skylinemapreducehadoop_spark.operators.temporal import (
        theil_sen_trend,
    )

    # weekly buckets: the estimator is quadratic in PERIODS, so the
    # bucket width sets the pair budget (343 weeks -> ~59k pairs per
    # group) independent of data volume
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        "o_orderpriority",
        F.floor(
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
            )
            / 7
        ).alias("t"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"))
    return theil_sen_trend(weekly, "o_orderpriority", "t", "v")


def _unconverted_clicks_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # abandonment query: clicks NOT followed by a purchase from the
    # same user within 1 day — one forward-looking window, no
    # correlated NOT EXISTS (temporal.not_followed_by)
    from skylinemapreducehadoop_spark.operators.temporal import not_followed_by

    ev = load_table(spark, sf_dir, "events")
    return not_followed_by(ev).orderBy("event_id")



def _rolling_active_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact 7-day rolling distinct users per day via the
    # contribute-explode after per-day dedup
    # (temporal.rolling_active_users)
    from skylinemapreducehadoop_spark.operators.temporal import (
        rolling_active_users,
    )

    ev = load_table(spark, sf_dir, "events")
    out = rolling_active_users(ev, window_days=7)
    # dates travel as strings through the compare harness (the
    # cohort_retention convention: pandas widens dates to midnight
    # timestamps otherwise)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active"
    ).orderBy("day")


def _transition_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # behavior-stream predictability: conditional entropy of the
    # per-user event-type Markov chain (temporal.transition_entropy)
    from skylinemapreducehadoop_spark.operators.temporal import (
        transition_entropy,
    )

    ev = load_table(spark, sf_dir, "events")
    return transition_entropy(ev)



def _interpolate_missing_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # linear gap repair on a per-priority daily series with PLANTED
    # missing days (every 11th day index nulled) — the step between
    # LOCF gapfill and model-grade resampling
    # (temporal.interpolate_missing); output = only the repaired rows
    from skylinemapreducehadoop_spark.operators.temporal import (
        interpolate_missing,
    )

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("t"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"))
    holey = daily.withColumn(
        "v", F.when(F.col("t") % 11 == 0, F.lit(None)).otherwise(F.col("v"))
    )
    out = interpolate_missing(holey, "o_orderpriority", "t", "v")
    return (
        out.where(F.col("v").isNull())
        .select("o_orderpriority", "t", "value_interp")
        .orderBy("o_orderpriority", "t")
    )


def _sorted_neighborhood_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hernandez-Stolfo sorted-neighborhood ER blocking over part
    # names: global_row_number ranks + offset-explode equi-join (no
    # band join), Levenshtein verify at radius 2 — the window-recall
    # complement of the exact-ed1 deletion blocking
    from skylinemapreducehadoop_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    part = load_table(spark, sf_dir, "part")
    return sorted_neighborhood_pairs(
        part, "p_name", "p_partkey", window=3, max_edit_distance=2
    ).orderBy("id_a", "id_b")



def _wilson_ci_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conversion rate by user segment with the small-sample-safe
    # Wilson score interval (stats.wilson_ci — exact rational z,
    # one sqrt + pinned divisions)
    from skylinemapreducehadoop_spark.operators.stats import wilson_ci

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 20).alias("segment"),
        (F.col("event_type") == "purchase").cast("int").alias("converted"),
    )
    return wilson_ci(ev, "segment", "converted")



_ZH_BANNER = "\u4e2d\u6587 \u6587\u672c \u6570\u636e \u5904\u7406 \u7cfb\u7edf \u6d4b\u8bd5 \u6837\u672c \u793a\u4f8b"


def _lang_purity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # code-switching screen: language-ID per aligned 8-token segment,
    # per-doc majority share — with PLANTED mixed docs (every 25th doc
    # re-appears with a CJK 8-token banner appended) that purity must
    # flag below 1.0. Composition of the segmenter + language_id; the
    # oracle replays the marker-vote + byte-gate heuristic per segment
    from skylinemapreducehadoop_spark.operators.dedup import (
        _aligned_segment_array,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 950000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + _ZH_BANNER)).alias("text"),
    )
    base = docs.unionByName(planted)
    segs = base.select(
        "doc_id",
        F.explode(_aligned_segment_array("text", 8)).alias("seg"),
    )
    lid = TX.language_id(segs, "seg", "seg_lang")
    per = lid.groupBy("doc_id", "seg_lang").agg(
        F.count(F.lit(1)).alias("__c")
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("__c").cast("long").alias("n_segments"),
        F.max(F.struct(F.col("__c"), F.col("seg_lang"))).alias("__m"),
    )
    return agg.select(
        "doc_id",
        "n_segments",
        F.col("__m.seg_lang").alias("majority_lang"),
        F.col("__m.__c").cast("long").alias("n_majority"),
        F.round(
            F.col("__m.__c").cast("double") / F.col("n_segments").cast("double"),
            9,
        ).alias("purity"),
    ).orderBy("doc_id")


# one of each artifact class, fully printable, no ASCII quote chars —
# interpolated VERBATIM into both the Spark plant and the DuckDB oracle
_MOJIBAKE_SNIPPET = "Ã©tÃ© donâ€™t â€œbad encodingâ€¦ â€” Â«quoteÂ» niÃ±o garÃ§on �"


def _mojibake_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # encoding-damage (ftfy-shaped) screen with PLANTED double-encoded
    # docs: every 31st doc re-appears with a mojibake snippet appended
    # and must be flagged; clean docs must NOT appear in the output.
    # Pure JVM regexp_count plan — map-only, no UDF (text.py)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 960000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + _MOJIBAKE_SNIPPET)).alias("text"),
    )
    base = docs.unionByName(planted)
    scr = TX.encoding_artifacts(base)
    return (
        scr.where(F.col("is_mojibake")).drop("is_mojibake").orderBy("doc_id")
    )


def _byte_token_budget_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-language byte/char/token budget table — what converts a
    # byte-sized crawl into a token-sized training budget per language
    # (CJK bytes_per_char ~3 vs Latin ~1). One hash aggregate, no UDF
    docs = load_table(spark, sf_dir, "documents")
    return TX.corpus_budget_stats(docs).orderBy("lang")


def _hard_positives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # anchor-positive mining: the same broadcast-slate miner as
    # hard_negatives with the label predicate flipped — the positive
    # side of a contrastive (anchor, positive, negatives) triple
    emb = load_table(spark, sf_dir, "embeddings")
    return S.hard_positives(emb, [0, 1, 2, 3, 17, 42], k=5).orderBy(
        "qid", "rank"
    )


def _line_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher/C4 line-level quality rules with PLANTED multi-line docs
    # (every 13th doc re-appears framed by bullet / ellipsis / short
    # lines); the corpus is single-line, so only planted docs have
    # n_lines > 1 — returned with their exact line-rule fractions
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 970000).alias("doc_id"),
        F.concat(
            F.lit("- intro bullet\n"),
            F.col("text"),
            F.lit("\n...\n- closing bullet\nshort\n\u2026"),
        ).alias("text"),
    )
    base = docs.unionByName(planted)
    st = TX.line_stats(base)
    return st.where(F.col("n_lines") > 1).orderBy("doc_id")


def _ndcg_bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ranking-quality evaluation: nDCG@20 of the BM25 ranking against
    # graded term-coverage relevance — position terms rounded to 6 and
    # summed in DECIMAL (order-free), rank windows over LIMIT-k frames
    from skylinemapreducehadoop_spark.operators.retrieval import (
        retrieval_ndcg,
    )

    docs = load_table(spark, sf_dir, "documents")
    return retrieval_ndcg(docs, _BM25_TERMS, k=20)


def _script_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unicode-script composition per language tag (script != language:
    # off-script mass = labeling/extraction bugs or shard leakage).
    # Pure JVM regexp_count over script properties + one hash agg
    docs = load_table(spark, sf_dir, "documents")
    return TX.script_mix(docs).orderBy("lang")


def _dedup_sweep_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup threshold tuning curve: exact pair/doc counts per Jaccard
    # threshold from ONE exact setsim pass at the loosest value —
    # the table a pipeline builds before committing to a dedup knob
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_threshold_sweep(docs)


def _fix_mojibake_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    # known-answer inverse law for the repair pass: damage every doc
    # with the engine's own bytes-as-Latin-1 decode, repair it with
    # fix_mojibake, and count exact round-trips per source. The oracle
    # states the law (n_repaired == n_docs for ALL text incl. CJK) and
    # the engine-independent n_changed (docs with any non-ASCII char —
    # ASCII text is a fixed point of the damage). All-JVM, one agg
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("source", "text")
    )
    moji = F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1")
    rep = TX.fix_mojibake(moji)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((rep == F.col("text")).cast("int"))
            .cast("long")
            .alias("n_repaired"),
            F.sum((moji != F.col("text")).cast("int"))
            .cast("long")
            .alias("n_changed"),
        )
        .orderBy("source")
    )


def _hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hard-negative mining for contrastive training data: per anchor,
    # the 5 most cosine-similar vectors with a DIFFERENT label.
    # Broadcast anchor slate + map-side JVM cosine + grouped_topk —
    # the corpus never shuffles; ranks on the rounded score
    emb = load_table(spark, sf_dir, "embeddings")
    return S.hard_negatives(emb, [0, 1, 2, 3, 17, 42], k=5).orderBy(
        "qid", "rank"
    )


# The 50-entry ROUND-15 driver window (COVERAGE.md "r15 rotation
# arithmetic", prepared at r14 and verified against the post-r14-driver
# staleness data before seating: rule-1 never-driver-checked = 0
# (STALENESS summary), rule-2 = 0 new (the 30 touched_since flags are a
# strict subset of r14's 43 — 13 cleared by r14 re-attestation, zero
# new; the r14/r15 diffs touch no operator module), so rule 3 governs
# all 50 slots). queries() reorders the registry so these lead;
# everything else keeps its _registry() order. The r14 window is
# recorded in COVERAGE.md and git history.
#
# The 13 below-window canaries (all driver-attested r13; canary_sum_raw
# deliberately hash-red, its differential job DONE — root cause
# confirmed at the driver) are data-independent fixture probes: per
# the exemption policy they sit BELOW the window permanently and
# re-enter only when a pinned primitive changes (rule 2), never by
# staleness. Any future driver red is read against COVERAGE.md's
# canary interpretation table FIRST, before any code change.
_R15_WINDOW: list[str] = [
    # (a) positions 1-31 (rule 3, stalest-first): ALL 31 staleness-6
    # entries (r9-green, slipped at r14 under the family-sibling rule;
    # every one had a same-family sibling green in the r14 window).
    "above_avg_orders",
    "approx_distinct_check",
    "bm25_index_search_documents",
    "clustering_coefficient_copurchase",
    "curate_corpus",
    "decontaminate_documents",
    "dedup_clusters_documents",
    "distinct_users_by_type",
    "embedding_near_dup",
    "explode_tokens_topk",
    "frequent_pairs_orders",
    "hash_split_documents",
    "incremental_dedup_documents",
    "ngram_dup_stats_documents",
    "pmi_collocations_documents",
    "q5_local_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
    "repetition_stats_documents",
    "reservoir_documents",
    "sample_documents_hash",
    "semi_join_customers",
    "skyline_blocked",
    "skyline_grouped",
    "skyline_gsod_9dim",
    "skyline_join_priority",
    "term_doc_freq_topk",
    "tfidf_keywords_documents",
    # (b) positions 32-50 (rule 3 backfill): 19 of the 50 staleness-5
    # entries (r10-green), family-coverage tiebreak per the prepared
    # split — SQL-dialect + dynamic skyline paths, the LSH recall twin
    # of the r14-seated IVF, the temporal family (as-of/range joins,
    # sessionize, funnel, window analytics), the incremental-rollup
    # attestor, cluster-closure dedup, semantic dedup, multimodal
    # resize + the only audio rep, weighted sampling, z-order layout,
    # BPE encode attestor, the upsert-protocol streaming replay,
    # drift stats, and the melt/all-NULL golden-records path. The 31
    # staleness-5 entries not seated slip to r16 under the
    # family-sibling rule (COVERAGE.md r16 arithmetic).
    "skyline_sql_lineitem",
    "dynamic_skyline_part",
    "ann_recall_lsh",
    "asof_join_events",
    "range_join_events",
    "sessionize_events",
    "funnel_users",
    "window_analytics_events",
    "incremental_rollup_check",
    "dedup_star_clusters",
    "semantic_dedup_embeddings",
    "resize_check",
    "audio_features_check",
    "weighted_sample_documents",
    "zorder_scan_check",
    "bpe_encode_check",
    "streaming_maintenance_replay",
    "distribution_drift_orders",
    "golden_records_customers",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: ORDER MATTERS — the harness checks the FIRST
    50 entries only. _R15_WINDOW leads (the r15 rotation); every
    other entry follows in _registry() order. The rows-only-by-design
    sketch outputs (approx_percentile_value, approx_distinct_users)
    are permanently BELOW the window per the r13 rotation-exemption
    policy (COVERAGE.md): a declared rows-only row can never attest a
    hash, so it no longer spends window slots — their hash-checkable
    derived siblings (approx_*_check) carry the attestation.
    """
    base = _registry()
    base.update(CN.canary_queries())
    out = {name: base[name] for name in _R15_WINDOW}
    for name, fn in base.items():
        if name not in out:
            out[name] = fn
    return out


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The full registry in its historical order (in-dict comments
    # record each past round's window; the CURRENT window ordering is
    # _R15_WINDOW above, applied by queries()).
    return {
        # ---- ROUND-12 WINDOW (driver checks the FIRST 50) ----
        # Per the rotation priority rule (COVERAGE.md): (a) positions
        # 1-37: ALL 37 remaining never-driver-checked end-r10 entries,
        # in their original order (the prepared r12 arithmetic);
        "chi2_events": _chi2_events,
        "survival_km_users": _survival_km_users,
        "benford_orders": _benford_orders,
        "trimmed_mean_orders": _trimmed_mean_orders,
        "position_attribution_events": _position_attribution_events,
        "mix_diversity_documents": _mix_diversity_documents,
        "pca_invariant_check": _pca_invariant_check,
        "l_diversity_customers": _l_diversity_customers,
        "ntile_buckets_lineitem": _ntile_buckets_lineitem,
        "calibration_documents": _calibration_documents,
        "vocab_budget_documents": _vocab_budget_documents,
        "balanced_shards_documents": _balanced_shards_documents,
        "normalize_nfc_documents": _normalize_nfc_documents,
        "referential_integrity_check": _referential_integrity_check,
        "mi_scan_events": _mi_scan_events,
        "image_dhash_check": _image_dhash_check,
        "leadlag_corr_events": _leadlag_corr_events,
        "seasonality_orders": _seasonality_orders,
        "interarrival_events": _interarrival_events,
        "winsorized_mean_orders": _winsorized_mean_orders,
        "theil_sen_orders": _theil_sen_orders,
        "unconverted_clicks_events": _unconverted_clicks_events,
        "rolling_active_events": _rolling_active_events,
        "transition_entropy_events": _transition_entropy_events,
        "interpolate_missing_orders": _interpolate_missing_orders,
        "sorted_neighborhood_parts": _sorted_neighborhood_parts,
        "wilson_ci_events": _wilson_ci_events,
        "lang_purity_documents": _lang_purity_documents,
        "mojibake_documents": _mojibake_documents,
        "byte_token_budget_documents": _byte_token_budget_documents,
        "script_mix_documents": _script_mix_documents,
        "ndcg_bm25_documents": _ndcg_bm25_documents,
        "line_stats_documents": _line_stats_documents,
        "hard_positives_embeddings": _hard_positives_embeddings,
        "dedup_sweep_documents": _dedup_sweep_documents,
        "fix_mojibake_check": _fix_mojibake_check,
        "hard_negatives_embeddings": _hard_negatives_embeddings,
        # (b) positions 38-40 (rule 2 — operators materially touched
        # this round re-earn their row at never-checked priority): the
        # two r11 driver-red entries whose root cause was the \s
        # whitespace-class divergence fixed this round, plus
        # token_bpe_documents, whose pre-tokenizer pattern AND oracle
        # were both pinned to the explicit class:
        "vocab_growth_documents": _vocab_growth_documents,
        "strip_boilerplate_documents": _strip_boilerplate_documents,
        "token_bpe_documents": _token_bpe_documents,
        # (c) positions 41-50: the stalest once-green entries, stalest
        # first (rule 3), family-coverage tiebreak within a tier. The
        # 16 r7-green that slip (histogram_orders, skyline_bruteforce/
        # 5dim/events, window_top2_orders, events_hourly,
        # fingerprint_rolling, dedup_exact, dedup_simhash,
        # ngram_jaccard, topk_similarity, multimodal_stats,
        # token_entropy, window_analytics_orders, kmeans_embeddings,
        # pagerank_dup_graph) lead the r13 window with the 45 r8-green:
        # (c1) the four STALEST once-green entries (r6, staleness 6 —
        # surfaced by the staleness tool's rows-only fix: their
        # declared rows-only driver rows previously read as red, so
        # prior rotations never ranked them). Rows-only by design,
        # with hash-green derived siblings (approx_*_check, ann_recall_*):
        "approx_percentile_value": _approx_percentile_value,
        "approx_distinct_users": _approx_distinct_users,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        # (c2) six of the 22 r7-green entries (staleness 5) by the
        # family-coverage tiebreak — two distinct skyline algorithms,
        # the profile rep, the two heaviest tokens()-consumers on the
        # driver corpus (the best at-driver probes of the tokenizer
        # pin), chunking:
        "skyline_layers": _sky_layers,
        "skyline_kband_events": _sky_kband_events,
        "profile_lineitem": _profile_lineitem,
        "text_stats_documents": _text_stats,
        "quality_flags_documents": _quality_flags,
        "chunk_documents": _chunk_documents,
        # --- past the driver's 50-entry window ---
        # (rotation log in COVERAGE.md; every entry below is
        # hash-green in the committed LOCALCHECK artifacts)
        # new in r12 (r11 verdict task 7 — the corrected month-bucket
        # branch of seasonality_index gets its own oracle-checked
        # entry); never driver-checked, leads the r13 window:
        "seasonality_month_orders": _seasonality_month_orders,
        # r11 driver window (48 green r11, staleness 1):
        "k_anonymity_customers": _k_anonymity_customers,
        "length_buckets_documents": _length_buckets_documents,
        "vocab_coverage_documents": _vocab_coverage_documents,
        "temperature_mix_documents": _temperature_mix_documents,
        "bloom_semi_join_orders": _bloom_semi_join_orders,
        "seasonal_anomalies_events": _seasonal_anomalies_events,
        "percentile_ranks_lineitem": _percentile_ranks_lineitem,
        "salted_join_agg_nation": _salted_join_agg_nation,
        "bfs_hops_copurchase": _bfs_hops_copurchase,
        "containment_pairs_documents": _containment_pairs_documents,
        "shortest_paths_copurchase": _shortest_paths_copurchase,
        "leakage_safe_split_documents": _leakage_safe_split_documents,
        "negative_pairs_documents": _negative_pairs_documents,
        "target_encode_events": _target_encode_events,
        "embedding_dim_stats": _embedding_dim_stats,
        "gram_matrix_embeddings": _gram_matrix_embeddings,
        "attribution_events": _attribution_events,
        "covariance_embeddings": _covariance_embeddings,
        "skew_report_events": _skew_report_events,
        "props_stats_events": _props_stats_events,
        "cm_rollup_check": _cm_rollup_check,
        "hist_quantile_rollup_check": _hist_quantile_rollup_check,
        "cusum_events": _cusum_events,
        "rfm_segments_customers": _rfm_segments_customers,
        "skipgram_cooc_documents": _skipgram_cooc_documents,
        "interval_union_events": _interval_union_events,
        "kmv_overlap_check": _kmv_overlap_check,
        "rrf_fusion_documents": _rrf_fusion_documents,
        "item_cf_parts": _item_cf_parts,
        "winnow_fingerprints_documents": _winnow_fingerprints_documents,
        "streaming_sketch_replay": _streaming_sketch_replay,
        "ab_test_events": _ab_test_events,
        "grouped_topk_orders": _grouped_topk_orders,
        "impute_values_events": _impute_values_events,
        "bmp_pixel_check": _bmp_pixel_check,
        "time_travel_check": _time_travel_check,
        "weighted_median_lineitem": _weighted_median_lineitem,
        "version_diff_check": _version_diff_check,
        "trend_by_type_events": _trend_by_type_events,
        "langid_confusion_documents": _langid_confusion_documents,
        "kmv_setops_check": _kmv_setops_check,
        "class_scatter_embeddings": _class_scatter_embeddings,
        "weighted_deciles_lineitem": _weighted_deciles_lineitem,
        "boilerplate_documents": _boilerplate_documents,
        "gini_orders": _gini_orders,
        "ewma_orders": _ewma_orders,
        "auc_purchase_events": _auc_purchase_events,
        "ks_test_events": _ks_test_events,
        # r10 driver window (all 50 green r10, staleness 2):
        "duplicate_spans_documents": _duplicate_spans_documents,
        "distribution_drift_orders": _distribution_drift_orders,
        "streaming_drift_replay": _streaming_drift_replay,
        "quantize_check_embeddings": _quantize_check_embeddings,
        "quantized_recall_check": _quantized_recall_check,
        "zorder_scan_check": _zorder_scan_check,
        "weighted_sample_documents": _weighted_sample_documents,
        "zipf_fit_tokens": _zipf_fit_tokens,
        "bpe_encode_check": _bpe_encode_check,
        "audio_features_check": _audio_features_check,
        "mad_outliers_orders": _mad_outliers_orders,
        "autocorr_events": _autocorr_events,
        "golden_records_customers": _golden_records_customers,
        "incremental_rollup_check": _incremental_rollup_check,
        "streaming_maintenance_replay": _streaming_maintenance_replay,
        "kmv_rollup_check": _kmv_rollup_check,
        "fd_check_customer": _fd_check_customer,
        "mutual_information_events": _mutual_information_events,
        "novelty_documents": _novelty_documents,
        "resize_check": _resize_check,
        "twap_events": _twap_events,
        "abc_parts": _abc_parts,
        "analyze_orders": _analyze_orders,
        "kcore_check": _kcore_check,
        "analyze_approx_check": _analyze_approx_check,
        "ann_recall_lsh": _ann_recall_lsh,
        "streaming_near_dup_replay": _streaming_near_dup_replay,
        "skyline_sql_lineitem": _skyline_sql_lineitem,
        "dynamic_skyline_part": _dynamic_skyline_part,
        "scd2_user_events": _scd2_user_events,
        "sessionize_events": _sessionize_events,
        "range_join_events": _range_join_events,
        "asof_join_events": _asof_join_events,
        "cohort_retention_users": _cohort_retention_users,
        "funnel_users": _funnel_users,
        "top_paths_users": _top_paths_users,
        "heavy_hitters_tokens": _heavy_hitters_tokens,
        "dedup_star_clusters": _dedup_star_clusters,
        "semantic_dedup_embeddings": _semantic_dedup_embeddings,
        "fuzzy_pairs_partnames": _fuzzy_pairs_partnames,
        "gapfill_events_hourly": _gapfill_events_hourly,
        "events_daily_rollup": _events_daily_rollup,
        "trailing_hour_events": _trailing_hour_events,
        "stratified_topk_documents": _stratified_topk_documents,
        "equidepth_histogram_events": _equidepth_histogram_events,
        "pack_sequences_documents": _pack_sequences_documents,
        "mix_corpus_sources": _mix_corpus_sources,
        "classifier_score_documents": _classifier_score_documents,
        "unigram_logprob_documents": _unigram_logprob_documents,
        "window_analytics_events": _window_analytics_events,
        # r7/r8/r9-green groups (in original order; the 12
        # slipped r7-green entries are interleaved here and
        # lead the r13 window):
        "histogram_orders": _histogram_orders,
        "window_top2_orders": _window_top2_orders,
        "events_hourly": _events_hourly,
        "dedup_exact_documents": _dedup_exact,
        "multimodal_stats": _multimodal_stats,
        "skyline_bruteforce": _sky("bruteforce"),
        "skyline_5dim": _sky_5dim,
        "skyline_events": _sky_events,
        "fingerprint_rolling_documents": _fingerprint_rolling,
        "dedup_simhash_documents": _dedup_simhash,
        "ngram_jaccard_documents": _ngram_jaccard,
        "topk_similarity": _topk_similarity,
        "token_entropy_documents": _token_entropy_documents,
        "window_analytics_orders": _window_analytics_orders,
        "linreg_lineitem": _linreg_lineitem,
        "corr_lineitem": _corr_lineitem,
        "zscore_outliers_events": _zscore_outliers_events,
        "triangle_count_copurchase": _triangle_count_copurchase,
        "bm25_search_documents": _bm25_search_documents,
        "event_transitions_markov": _event_transitions_markov,
        "segment_dedup_documents": _segment_dedup_documents,
        "segment_dedup_shifted": _segment_dedup_shifted,
        "approx_percentile_check": _approx_percentile_check,
        "streaming_session_replay": _streaming_session_replay,
        "bigram_logprob_documents": _bigram_logprob_documents,
        "image_header_check": _image_header_check,
        "data_quality_orders": _data_quality_orders,
        "streaming_enrich_replay": _streaming_enrich_replay,
        "encode_documents": _encode_documents,
        "streaming_rollup_replay": _streaming_rollup_replay,
        "entity_resolution_partnames": _entity_resolution_partnames,
        "decontaminate_fuzzy_documents": _decontaminate_fuzzy_documents,
        "pivot_user_events": _pivot_user_events,
        "percentile_value_by_type": _percentile_value_by_type,
        "cube_events": _cube_events,
        "set_ops_customers": _set_ops_customers,
        "rollup_orders": _rollup_orders,
        "anti_join_customers": _anti_join_customers,
        "q10_returned_items": _q10_returned_items,
        "q1_pricing_summary": _q1_pricing,
        "join_nation_revenue": _join_nation_revenue,
        "q8_market_share": _q8_market_share,
        "q9_profit_by_nation": _q9_profit_by_nation,
        "q11_important_brands": _q11_important_brands,
        "q13_customer_distribution": _q13_customer_distribution,
        "q15_top_supplier": _q15_top_supplier,
        "q3_shipping_priority": _q3_shipping_priority,
        "q6_forecast_revenue": _q6_forecast_revenue,
        "q4_priority_exists": _q4_priority_exists,
        "q7_volume_shipping": _q7_volume_shipping,
        "q12_priority_by_linestatus": _q12_priority_by_linestatus,
        "knn_graph_sample": _knn_graph_sample,
        "q21_waiting_orders": _q21_waiting_orders,
        "q20_excess_suppliers": _q20_excess_suppliers,
        "streaming_dedup_replay": _streaming_dedup_replay,
        "streaming_skyline_replay": _streaming_skyline_replay,
        "streaming_interval_join_replay": _streaming_interval_join_replay,
        "q2_min_cost_supplier": _q2_min_cost_supplier,
        "q14_promo_revenue": _q14_promo_revenue,
        "bm25_index_search_documents": _bm25_index_search_documents,
        "pmi_collocations_documents": _pmi_collocations_documents,
        "bpe_merges_check": _bpe_merges_check,
        "clustering_coefficient_copurchase": _clustering_coefficient_copurchase,
        "frequent_pairs_orders": _frequent_pairs_orders,
        "streaming_moments_replay": _streaming_moments_replay,
        "table_diff_orders": _table_diff_orders,
        "tfidf_keywords_documents": _tfidf_keywords_documents,
        "max_concurrency_events": _max_concurrency_events,
        "incremental_dedup_documents": _incremental_dedup_documents,
        "frame_sample_check": _frame_sample_check,
        "skyline_blocked": _sky_blocked,
        "ann_recall_ivf": _ann_recall_ivf,
        "approx_distinct_check": _approx_distinct_check,
        "kmeans_blobs_check": _kmeans_blobs_check,
        "pagerank_cycle_check": _pagerank_cycle_check,
        "distinct_users_by_type": _distinct_users_by_type,
        "q17_small_qty_revenue": _q17_small_qty_revenue,
        "q18_large_orders": _q18_large_orders,
        "q5_local_supplier": _q5_local_supplier,
        "skyline_twophase": _sky("twophase"),
        "skyline_quadtree": _sky("quadtree"),
        "skyline_grouped": _sky_grouped,
        "skyline_join_priority": _sky_join_priority,
        "skyline_gsod_9dim": _sky_gsod_9dim,
        "lang_id_documents": _lang_id,
        "dedup_minhash_documents": _dedup_minhash,
        "reverse_skyline_part": _reverse_skyline_part,
        "repetition_stats_documents": _repetition_stats,
        "redact_pii_documents": _redact_pii,
        "dedup_clusters_documents": _dedup_clusters,
        "jsonl_roundtrip_documents": _jsonl_roundtrip,
        "ngram_dup_stats_documents": _ngram_dup_stats,
        "hash_split_documents": _hash_split_documents,
        "term_doc_freq_topk": _term_doc_freq_topk,
        "sample_documents_hash": _sample_documents_hash,
        "reservoir_documents": _reservoir_documents,
        "semi_join_customers": _semi_join_customers,
        "above_avg_orders": _above_avg_orders,
        "explode_tokens_topk": _explode_tokens_topk,
        "string_funcs_documents": _string_funcs_documents,
        "curate_corpus": _curate_corpus,
        "decontaminate_documents": _decontaminate_documents,
        "topk_batch_similarity": _topk_batch_similarity,
        "setsim_join_documents": _setsim_join_documents,
        "embedding_near_dup": _embedding_near_dup,
        "q16_supplier_cnt": _q16_supplier_cnt,
        "q19_disjunctive_revenue": _q19_disjunctive_revenue,
        "q22_sales_opportunity": _q22_sales_opportunity,
        # rows-only by declared design (hash-green derived/known-
        # answer siblings: recall bounds / sketch / fixed-point):
        "kmeans_embeddings": _kmeans_embeddings,
        "pagerank_dup_graph": _pagerank_dup_graph,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL


# --- fast skyline oracle SQL -------------------------------------------
# The naive NOT EXISTS dominance anti-join is O(n²) and dominates the
# whole correctness run's wall clock. These generators emit a two-phase
# equivalent: (1) skyline of the `pre_limit` best rows by a normalized
# monotone score ("presky"), (2) drop every row strictly dominated by a
# presky point ("cand" — only dominated rows are removed, so
# skyline(cand) = skyline(base), with transitivity covering dominators
# that were themselves removed), (3) NOT EXISTS within the tiny cand
# set. Output rows are IDENTICAL to the naive SQL; verified row-for-row
# in tests and at swap-in time.

_TS_DIMS = {"l_shipdate", "ts"}


def _dom_sql(qa: str, pa: str, dims, prefix: str = "") -> str:
    le = " AND ".join(f"{qa}.{c} {'<=' if d == 'min' else '>='} {pa}.{c}" for c, d in dims)
    lt = " OR ".join(f"{qa}.{c} {'<' if d == 'min' else '>'} {pa}.{c}" for c, d in dims)
    return f"{prefix}{le} AND ({lt})"


def _score_sql(dims, over: str = "") -> str:
    terms = []
    for c, d in dims:
        v = f"epoch_us({c})" if c in _TS_DIMS else c
        s = v if d == "min" else f"(-({v}))"
        terms.append(
            f"coalesce((({s}) - min({s}) OVER ({over}))"
            f" / nullif(max({s}) OVER ({over}) - min({s}) OVER ({over}), 0), 0)"
        )
    return " + ".join(terms)


def _fast_sky_sql(cols: str, dims, table: str = "lineitem", pre_limit: int = 2000) -> str:
    nn = " AND ".join(f"{c} IS NOT NULL" for c, _ in dims)
    dom_qp = _dom_sql("q", "p", dims)
    dom_sb = _dom_sql("s", "b", dims)
    return f"""
WITH base AS (SELECT {cols} FROM {table} WHERE {nn}),
sc AS (SELECT *, {_score_sql(dims)} AS __sc FROM base),
pre AS (SELECT {cols} FROM sc ORDER BY __sc LIMIT {pre_limit}),
presky AS (SELECT * FROM pre p WHERE NOT EXISTS (SELECT 1 FROM pre q WHERE {dom_qp})),
cand AS (SELECT * FROM base b WHERE NOT EXISTS (SELECT 1 FROM presky s WHERE {dom_sb}))
SELECT {cols} FROM cand p WHERE NOT EXISTS (SELECT 1 FROM cand q WHERE {dom_qp})
"""


_SKY_DIMS_SQL = [("l_extendedprice", "min"), ("l_discount", "min"), ("l_quantity", "max")]


def _sky_oracle(cols: str = "l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity") -> str:
    return _fast_sky_sql(cols, _SKY_DIMS_SQL)


def _grouped_sky_oracle(
    key: str = "l_returnflag",
    cols: str = "l_returnflag, l_orderkey, l_linenumber, l_extendedprice, l_quantity",
    from_sql: str = "lineitem",
    dims: list[tuple[str, str]] | None = None,
) -> str:
    dims = dims or [("l_extendedprice", "min"), ("l_quantity", "max")]
    over = f"PARTITION BY {key}"
    dom_qp = _dom_sql("q", "p", dims, f"q.{key} = p.{key} AND ")
    dom_sb = _dom_sql("s", "b", dims, f"s.{key} = b.{key} AND ")
    nn = " AND ".join(f"{c} IS NOT NULL" for c, _ in dims)
    return f"""
WITH base AS (
  SELECT {cols} FROM {from_sql}
  WHERE {nn}),
sc AS (SELECT *, {_score_sql(dims, over)} AS __sc FROM base),
rk AS (SELECT *, row_number() OVER ({over} ORDER BY __sc) AS __rn FROM sc),
pre AS (SELECT {cols} FROM rk WHERE __rn <= 2000),
presky AS (SELECT * FROM pre p WHERE NOT EXISTS (SELECT 1 FROM pre q WHERE {dom_qp})),
cand AS (SELECT * FROM base b WHERE NOT EXISTS (SELECT 1 FROM presky s WHERE {dom_sb}))
SELECT {cols} FROM cand p WHERE NOT EXISTS (SELECT 1 FROM cand q WHERE {dom_qp})
"""


def _layers_oracle() -> str:
    dims = _SKY_DIMS_SQL
    cols = "l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity"
    dom_qp = _dom_sql("q", "p", dims)
    dom_sb = _dom_sql("s", "b", dims)
    parts = [
        f"""base1 AS (
  SELECT {cols} FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL AND l_quantity IS NOT NULL)"""
    ]
    for k in (1, 2, 3):
        parts.append(
            f"""sc{k} AS (SELECT *, {_score_sql(dims)} AS __sc FROM base{k}),
pre{k} AS (SELECT {cols} FROM sc{k} ORDER BY __sc LIMIT 2000),
presky{k} AS (SELECT * FROM pre{k} p WHERE NOT EXISTS (SELECT 1 FROM pre{k} q WHERE {dom_qp})),
cand{k} AS (SELECT * FROM base{k} b WHERE NOT EXISTS (SELECT 1 FROM presky{k} s WHERE {dom_sb})),
l{k} AS (SELECT {cols} FROM cand{k} p WHERE NOT EXISTS (SELECT 1 FROM cand{k} q WHERE {dom_qp}))"""
        )
        if k < 3:
            parts.append(f"base{k+1} AS (SELECT * FROM base{k} EXCEPT ALL SELECT * FROM l{k})")
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT *, CAST(1 AS INTEGER) AS layer FROM l1
UNION ALL SELECT *, CAST(2 AS INTEGER) FROM l2
UNION ALL SELECT *, CAST(3 AS INTEGER) FROM l3
"""


_SIMHASH_BITS = 60


def _simhash_oracle() -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(_SIMHASH_BITS)
    )
    bits = "\n  + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
  FROM documents
),
th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
bits AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
SELECT doc_id, ({bits}) AS simhash FROM bits
"""


_JACCARD_PAIRS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
"""

#: segment_dedup twin: DuckDB list slicing is 1-based end-INCLUSIVE,
#: so t[(i-1)*10+1 : i*10] is exactly Spark's slice(t, (i-1)*10+1, 10)
_SEGMENT_DEDUP_SQL = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES (600000, ''), (600001, NULL), (600002, '   ')) v(doc_id, text)
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
  WHERE text IS NOT NULL AND trim(text) <> ''
),
segs AS (
  SELECT doc_id,
         unnest(range(1, greatest((len(t)+9)//10, 1)+1)) AS pos,
         unnest([array_to_string(t[(i-1)*10+1 : i*10], ' ')
                 FOR i IN range(1, greatest((len(t)+9)//10, 1)+1)]) AS seg
  FROM toks
),
firsts AS (
  SELECT seg, doc_id, pos,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
),
kept AS (SELECT doc_id, pos, seg FROM firsts WHERE rn = 1),
rebuilt AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (
  -- DuckDB's greatest() ignores NULL args, so guard the missing-join
  -- case explicitly (empty docs must report 0 segments, not 1)
  SELECT b.doc_id,
         CASE WHEN k.t IS NULL THEN 0
              ELSE greatest((len(k.t)+9)//10, 1) END::INT AS n_segments
  FROM base b LEFT JOIN toks k USING (doc_id)
)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, t.n_segments,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""

#: segment_dedup mode='cdc' twin over the corpus + planted +1-token-
#: shifted copies of every 20th doc: boundaries open at md5-anchor
#: tokens (60-bit hex prefix % 10 == 0) — the same construction in
#: both engines, so segment boundaries agree bit-for-bit; two zipped
#: unnests give (pos, tok) and a running sum of anchor flags numbers
#: the segments
_SEGMENT_CDC_SQL = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000, 'zz ' || text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT * FROM (VALUES (600000, ''), (600001, NULL), (600002, '   ')) v(doc_id, text)
),
tk AS (
  SELECT doc_id,
         unnest(range(1, len(t)+1)) AS pos,
         unnest(t) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
        WHERE text IS NOT NULL AND trim(text) <> '')
),
st AS (
  SELECT doc_id, pos, tok,
         sum(CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT % 10 = 0
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS seg_idx
  FROM tk
),
segs AS (
  SELECT doc_id, seg_idx,
         string_agg(tok, ' ' ORDER BY pos) AS seg,
         min(pos) AS pos
  FROM st GROUP BY doc_id, seg_idx
),
firsts AS (
  SELECT seg, doc_id, pos,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
),
kept AS (SELECT doc_id, pos, seg FROM firsts WHERE rn = 1),
rebuilt AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
),
seg_counts AS (SELECT doc_id, count(*)::INT AS n_segments FROM segs GROUP BY doc_id),
totals AS (
  SELECT b.doc_id, coalesce(c.n_segments, 0)::INT AS n_segments
  FROM base b LEFT JOIN seg_counts c USING (doc_id)
)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, t.n_segments,
       coalesce(r.n_kept, 0)::BIGINT AS n_kept
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""

#: planted-neighbor ANN recall twin (shared by the LSH and IVF recall
#: queries): expected recall@10 derived from the data — the count of
#: planted exact copies (cosine 1.0) inside the exact top-10
_ANN_RECALL_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
  UNION ALL
  SELECT 900000 + t.i, q.v FROM q, range(10) t(i)
),
exact AS (
  SELECT c.vec_id
  FROM corpus c, q
  ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id
  LIMIT 10
)
SELECT CAST(10 AS INTEGER) AS k, CAST(count(*) AS INTEGER) AS recall_hits
FROM exact WHERE vec_id >= 900000
"""

#: r13 (VERDICT task 5): the converted ann_*_topk oracle — the exact
#: brute-force cosine top-10 RESULT LIST over the same planted
#: corpus; on this fixture a correct ANN index must return exactly
#: this list (the planted copies score cosine 1.0 > any natural pair)
_ANN_TOPK_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
  UNION ALL
  SELECT 900000 + t.i, q.v FROM q, range(10) t(i)
),
top AS (
  SELECT c.vec_id, round(list_cosine_similarity(c.v, q.v), 6) AS score
  FROM corpus c, q
  ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id
  LIMIT 10
)
SELECT vec_id, score FROM top ORDER BY vec_id
"""

#: derived-oracle sketch twins: exact figures from the data + the
#: asserted in-bound booleans (see the harness functions for why the
#: booleans are deterministic)
_APPROX_DISTINCT_CHECK_SQL = """
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""

_APPROX_PCTL_CHECK_SQL = """
SELECT event_type,
       count(value)::BIGINT AS n,
       TRUE AS ok50,
       TRUE AS ok90
FROM events WHERE value IS NOT NULL GROUP BY event_type
"""

#: heavy_hitters twin: the MG+recount operator's contract IS the plain
#: GROUP BY ... HAVING — the sketch only bounds what gets shuffled
_HEAVY_HITTERS_SQL = """
WITH tk AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS value FROM documents
),
tot AS (SELECT count(*) AS n FROM tk)
SELECT value, count(*)::BIGINT AS cnt
FROM tk, tot GROUP BY value, tot.n
HAVING count(*) >= ceil(0.02 * n)
"""

#: classifier twin: same 60-bit md5 bucket construction as the simhash
#: oracle; integer weight sum is order-free, sigmoid rounded to 6
_CLASSIFIER_SQL = """
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
),
w AS (
  SELECT doc_id,
         ((('0x' || substr(md5(tok), 1, 15))::BIGINT % 10007) * 2654435761) % 10007 - 5003 AS wt
  FROM tk
),
agg AS (
  SELECT doc_id, sum(wt)::BIGINT AS sw, count(*)::BIGINT AS n_tokens FROM w GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       sw::DOUBLE / (n_tokens::DOUBLE * 5003.0) AS score,
       round(1.0 / (1.0 + exp(-(sw::DOUBLE / (n_tokens::DOUBLE * 5003.0)))), 6) AS prob
FROM agg
"""

_HISTOGRAM_SQL = """
SELECT least(greatest(floor((o_totalprice::DOUBLE - 0.0) / 50000.0), 0), 11)::INT AS bucket,
       count(*)::BIGINT AS cnt,
       min(o_totalprice::DOUBLE) AS min_v,
       max(o_totalprice::DOUBLE) AS max_v
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY 1
"""

_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, greatest(len(t), 1))]) AS gram
  FROM toks
),
counts AS (
  SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM grams GROUP BY doc_id, gram
),
ranked AS (
  SELECT doc_id, cnt, gram,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn,
         sum(cnt) OVER (PARTITION BY doc_id) AS n_grams,
         count(*) OVER (PARTITION BY doc_id) AS n_distinct_grams
  FROM counts
)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_distinct_grams::BIGINT AS n_distinct_grams,
       cnt AS top_gram_count, gram AS top_gram
FROM ranked WHERE rn = 1
"""

#: same planting + patterns as _redact_pii / functions.text.PII_PATTERNS
#: (patterns are RE2-compatible by design; DuckDB needs the 'g' flag —
#: its regexp_replace replaces only the first match by default)
_REDACT_PII_SQL = """
WITH planted AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com'
           WHEN doc_id % 5 = 1 THEN ' call 555-123-4567 today'
           WHEN doc_id % 5 = 2 THEN ' host 10.0.0.' || (doc_id % 250)
           ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'))::BIGINT AS n_phone,
       len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
         '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g') AS redacted
FROM planted
"""

#: transitive closure over the EXACT-Jaccard pair list (the minhash
#: query's recall at J>=0.5 is ~1-1e-8, so the pair sets — and hence
#: the components — coincide; the pair-level identity is itself
#: hash-checked by dedup_minhash_documents)
_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""

_STOPWORDS_SQL = "('the','a','an','of','to','and','in','is','it')"


def _lang_id_oracle_indent() -> str:
    """The lang_id oracle as a CTE body (confusion-matrix wrapper)."""
    return _lang_id_oracle().strip()


def _lang_id_oracle() -> str:
    # SQL twin of TX.language_id. The pandas UDF counts non-overlapping
    # matches of (?<!\S)(marker|...)(?!\S) — i.e. whole whitespace-
    # delimited tokens equal to a marker — which RE2 (DuckDB) can't
    # express directly (no lookarounds) but a token-list filter can,
    # exactly. Tie order = _LANG_MARKERS dict order (first max wins),
    # reproduced by the cascading CASE.
    from skylinemapreducehadoop_spark.functions.text import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    counts = ",\n         ".join(
        "len(list_filter(toks, t -> t IN ({}))) AS c_{}".format(
            ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    case_lines = []
    for i, lang in enumerate(langs[:-1]):
        ge = " AND ".join(f"c_{lang} >= c_{other}" for other in langs[i + 1 :])
        case_lines.append(f"WHEN {ge} THEN '{lang}'")
    case_sql = "\n            ".join(case_lines)
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim({TX.ascii_lower_sql("coalesce(text, '')")}), '\\s+') AS toks,
         octet_length(encode(coalesce(text, ''))) - length(coalesce(text, '')) AS extra_bytes,
         length(coalesce(text, '')) AS n_chars
  FROM documents),
c AS (
  SELECT doc_id, n_chars, extra_bytes,
         {counts}
  FROM t)
SELECT doc_id,
       CASE WHEN n_chars = 0 THEN 'en'
            WHEN extra_bytes * 3 > n_chars * 2 THEN 'zh'
            {case_sql}
            ELSE '{langs[-1]}' END AS lang_pred
FROM c
"""


def _lang_purity_oracle() -> str:
    # segment-level twin of _lang_id_oracle + per-doc majority share;
    # the planted CJK banner re-uses the exact _ZH_BANNER literal
    from skylinemapreducehadoop_spark.functions.text import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    counts = ",\n         ".join(
        "len(list_filter(stoks, t -> t IN ({}))) AS c_{}".format(
            ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    case_lines = []
    for i, lang in enumerate(langs[:-1]):
        ge = " AND ".join(f"c_{lang} >= c_{other}" for other in langs[i + 1 :])
        case_lines.append(f"WHEN {ge} THEN '{lang}'")
    case_sql = "\n            ".join(case_lines)
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 950000, text || ' {_ZH_BANNER}'
  FROM documents WHERE doc_id % 25 = 0
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
  WHERE text IS NOT NULL AND trim(text) <> ''
),
segs AS (
  SELECT doc_id,
         unnest([array_to_string(t[(i-1)*8+1 : i*8], ' ')
                 FOR i IN range(1, greatest((len(t)+7)//8, 1)+1)]) AS seg
  FROM toks
),
st AS (
  SELECT doc_id, seg,
         regexp_split_to_array(trim({TX.ascii_lower_sql("coalesce(seg, '')")}), '\\s+')
           AS stoks,
         octet_length(encode(coalesce(seg, ''))) - length(coalesce(seg, ''))
           AS extra_bytes,
         length(coalesce(seg, '')) AS n_chars
  FROM segs),
c AS (
  SELECT doc_id, n_chars, extra_bytes,
         {counts}
  FROM st),
lid AS (
  SELECT doc_id,
         CASE WHEN n_chars = 0 THEN 'en'
              WHEN extra_bytes * 3 > n_chars * 2 THEN 'zh'
              {case_sql}
              ELSE '{langs[-1]}' END AS seg_lang
  FROM c),
per AS (SELECT doc_id, seg_lang, count(*) AS c FROM lid GROUP BY 1, 2),
r AS (
  SELECT doc_id, seg_lang, c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, seg_lang DESC) AS rn,
         sum(c) OVER (PARTITION BY doc_id) AS n_segments
  FROM per)
SELECT doc_id, CAST(n_segments AS BIGINT) AS n_segments,
       seg_lang AS majority_lang, CAST(c AS BIGINT) AS n_majority,
       round(CAST(c AS DOUBLE) / CAST(n_segments AS DOUBLE), 9) AS purity
FROM r WHERE rn = 1 ORDER BY doc_id
"""



#: round-8 oracle twins. Float-determinism contract shared with the
#: Spark side: moments as EXACT integer sums (HUGEINT here, decimal(38)
#: there), the SAME fixed sequence of IEEE ops on the same exact
#: inputs, round() at the end; log2 args integer-valued (the LM-scorer
#: rule); BM25 rank compares the ROUNDED score with id tiebreak.
_LINREG_SQL = """
WITH q AS (
  SELECT CAST(round(l_quantity * 1) AS HUGEINT) AS x,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
  FROM q
),
d AS (
  SELECT CAST(n AS DOUBLE) AS nd, n,
         CAST(sx AS DOUBLE) / 1.0 AS sx, CAST(sy AS DOUBLE) / 100.0 AS sy,
         CAST(sxx AS DOUBLE) / 1.0 AS sxx, CAST(sxy AS DOUBLE) / 100.0 AS sxy,
         CAST(syy AS DOUBLE) / 10000.0 AS syy
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       round((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 9) AS slope,
       round((sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd, 9) AS intercept,
       round(((nd*sxy - sx*sy) * (nd*sxy - sx*sy))
             / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)), 9) AS r2
FROM d
"""

_CORR_SQL = """
WITH q AS (
  SELECT CAST(round(l_quantity * 1) AS HUGEINT) AS x0,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS x1,
         CAST(round(l_discount * 100) AS HUGEINT) AS x2
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x0) AS DOUBLE) / 1.0 AS s0,
         CAST(sum(x1) AS DOUBLE) / 100.0 AS s1,
         CAST(sum(x2) AS DOUBLE) / 100.0 AS s2,
         CAST(sum(x0*x0) AS DOUBLE) / 1.0 AS p00,
         CAST(sum(x0*x1) AS DOUBLE) / 100.0 AS p01,
         CAST(sum(x0*x2) AS DOUBLE) / 100.0 AS p02,
         CAST(sum(x1*x1) AS DOUBLE) / 10000.0 AS p11,
         CAST(sum(x1*x2) AS DOUBLE) / 10000.0 AS p12,
         CAST(sum(x2*x2) AS DOUBLE) / 10000.0 AS p22
  FROM q
)
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       round((n*p01 - s0*s1) / sqrt((n*p00 - s0*s0) * (n*p11 - s1*s1)), 9) AS corr FROM m
UNION ALL
SELECT 'l_quantity', 'l_discount',
       round((n*p02 - s0*s2) / sqrt((n*p00 - s0*s0) * (n*p22 - s2*s2)), 9) FROM m
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       round((n*p12 - s1*s2) / sqrt((n*p11 - s1*s1) * (n*p22 - s2*s2)), 9) FROM m
"""

_ZSCORE_SQL = """
WITH q AS (
  SELECT event_type, CAST(round(value * 1000000) AS HUGEINT) AS x
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n, sum(x) AS s, sum(x*x) AS sxx
  FROM q GROUP BY 1
)
SELECT q.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN (m.n*q.x - m.s)*(m.n*q.x - m.s)
                          > 9*(m.n*m.sxx - m.s*m.s)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM q JOIN m USING (event_type)
GROUP BY 1 ORDER BY 1
"""

#: direct a<b<c triple join — an independent formulation of the same
#: count the degree-ordered wedge closure computes
_TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab JOIN e bc ON ab.b = bc.a
          JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
"""

_BM25_SQL = """
WITH tok AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tokens
  FROM dl
),
tf AS (
  SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE tok IN ('hash', 'merge', 'spark', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.id,
         (log2(CAST(2*c.n_docs + 2 AS DOUBLE)) - log2(CAST(2*d.df_t + 1 AS DOUBLE)))
         * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
            / (CAST(tf.tf AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
               * (1.0 - CAST(0.75 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE)
                  * (CAST(dl.dl AS DOUBLE) * CAST(c.n_docs AS DOUBLE)
                     / CAST(c.total_tokens AS DOUBLE))))) AS contrib
  FROM tf JOIN dfreq d USING (tok) JOIN dl USING (id) CROSS JOIN corpus c
),
perdoc AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(contrib))),
                           (a, b) -> a + b), 6) AS score
  FROM contrib GROUP BY id
)
SELECT id AS doc_id, n_terms_hit, score
FROM perdoc ORDER BY score DESC, id LIMIT 20
"""

_TABLE_DIFF_SQL = """
WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
newer AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM o WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM o WHERE o_orderkey % 53 = 0
),
j AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
              THEN 'changed' ELSE 'unchanged' END AS status
  FROM o a FULL OUTER JOIN newer b USING (o_orderkey)
)
SELECT status, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1 ORDER BY 1
"""

#: streaming exact-moments twin: the same integer grid (round =
#: half-away-from-zero on both engines), sums as strings because
#: sum(q^2) exceeds int64
_STREAM_MOMENTS_SQL = """
WITH q AS (
  SELECT event_type, CAST(round(value * 1000000) AS HUGEINT) AS x
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS VARCHAR) AS sum_q,
       CAST(sum(x*x) AS VARCHAR) AS sumsq_q
FROM q GROUP BY 1 ORDER BY 1
"""

_CLUSTERING_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e ab JOIN e bc ON ab.b = bc.a
            JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
  ) GROUP BY 1
),
w AS (SELECT CAST(sum(d*(d-1))//2 AS BIGINT) AS n_wedges FROM deg)
SELECT n_triangles, n_wedges,
       round(3 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 9) AS coefficient
FROM tri CROSS JOIN w
"""

_FREQ_PAIRS_SQL = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bi),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
p AS (
  SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS support
  FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT item_a, item_b, support,
       round(CAST(support * n_baskets AS DOUBLE)
             / CAST(ca.c * cb.c AS DOUBLE), 9) AS lift
FROM p JOIN ic ca ON ca.i = p.item_a JOIN ic cb ON cb.i = p.item_b
CROSS JOIN nb
ORDER BY support DESC, item_a, item_b LIMIT 50
"""

#: known-answer oracle for the iterative BPE trainer: the planted
#: Sennrich-example corpus's merge sequence, derived analytically (and
#: by the reference implementation in tests/test_text.py)
_BPE_CHECK_SQL = """
SELECT * FROM (VALUES
  (0, 'e', 's', 9), (1, 'es', 't', 9), (2, 'est', '</w>', 9),
  (3, 'l', 'o', 7), (4, 'lo', 'w', 7), (5, 'e', 'w', 6),
  (6, 'ew', 'est</w>', 6), (7, 'n', 'ewest</w>', 6),
  (8, 'low', '</w>', 5), (9, 'd', 'est</w>', 3)
) v("rank", "left", "right", pair_count)
"""

_BPE_ENCODE_SQL = """
SELECT * FROM (VALUES
  ('low', 'low </w>'),
  ('lower', 'low er</w>'),
  ('lowest', 'low e s t </w>'),
  ('newer', 'ne w er</w>'),
  ('wider', 'w i d er</w>'),
  ('new', 'ne w </w>')
) v(word, encoded)
"""

# count-min probe oracle: rebuilds the md5-bucketed sketch cells in SQL
# and answers the same point queries — shared by the batch rollup entry
# (cm_rollup_check) and the streaming fold (streaming_sketch_replay),
# which must converge to the identical standing sketch (CM linearity)
_CM_PROBE_SQL = """
WITH keyed AS (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events WHERE user_id IS NOT NULL
  GROUP BY event_type, user_id
),
cells AS (
  SELECT event_type, r,
         ('0x' || substr(md5(CAST(r AS VARCHAR) || '|'
                             || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 1024 AS b,
         sum(cnt) AS c
  FROM keyed CROSS JOIN (SELECT unnest(range(4)) AS r)
  GROUP BY event_type, r, b
),
probes AS (
  SELECT event_type, user_id, cnt AS exact_cnt
  FROM keyed WHERE user_id % 50 = 0
)
SELECT p.event_type, p.user_id,
       CAST(min(c.c) AS BIGINT) AS est_cnt,
       CAST(p.exact_cnt AS BIGINT) AS exact_cnt
FROM probes p JOIN cells c
  ON c.event_type = p.event_type
 AND c.b = ('0x' || substr(md5(CAST(c.r AS VARCHAR) || '|'
                               || CAST(p.user_id AS VARCHAR)), 1, 15))::BIGINT
           % 1024
GROUP BY p.event_type, p.user_id, p.exact_cnt
ORDER BY p.event_type, p.user_id
"""

_PMI_SQL = """
WITH tk AS (
  SELECT doc_id, unnest(range(1, len(t)+1)) AS pos, unnest(t) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
),
bg AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
p AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
f AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM p GROUP BY 1),
s AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM p GROUP BY 1),
n AS (SELECT CAST(sum(c12) AS BIGINT) AS nb FROM p)
SELECT w1, w2, c12,
       round((log2(CAST(c12 AS DOUBLE)) + log2(CAST(nb AS DOUBLE)))
             - (log2(CAST(c1 AS DOUBLE)) + log2(CAST(c2 AS DOUBLE))), 6) AS pmi
FROM p JOIN f USING (w1) JOIN s USING (w2) CROSS JOIN n
WHERE c12 >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 50
"""

_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
p AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, cnt,
       round(CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
FROM p ORDER BY from_type, to_type
"""


_TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id, t AS token FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents WHERE text IS NOT NULL) WHERE t <> ''
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents WHERE text IS NOT NULL),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf * (log2(n_docs + 1) - log2(df_t)), 6) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rank,
         score
  FROM scored
)
SELECT doc_id, token, rank, score FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""

_MAX_CONCURRENCY_SQL = """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + 60000000 * (1 + event_id % 5) AS e
  FROM events
),
d AS (
  SELECT event_type, s AS t, 1 AS d FROM iv WHERE e > s
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv WHERE e > s
),
r AS (
  SELECT event_type,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM d
)
SELECT event_type, CAST(max(run) AS BIGINT) AS max_concurrent
FROM r GROUP BY 1 ORDER BY event_type
"""

_INCREMENTAL_DEDUP_SQL = """
WITH corpus AS (
  SELECT md5(text) AS h FROM documents
  WHERE doc_id % 10 <> 0 AND text IS NOT NULL
),
batch AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0),
fresh AS (
  SELECT doc_id, h FROM batch b
  WHERE b.h IS NULL OR NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
)
SELECT doc_id FROM (
  SELECT doc_id,
         CASE WHEN h IS NULL THEN 1
              ELSE row_number() OVER (PARTITION BY h ORDER BY doc_id) END AS rn
  FROM fresh
) WHERE rn = 1 ORDER BY doc_id
"""

_DRIFT_SQL = """
WITH base AS (
  SELECT o_totalprice AS v FROM orders
  WHERE o_orderkey % 4 <> 0 AND o_totalprice IS NOT NULL
),
cur AS (
  SELECT o_totalprice AS v FROM orders
  WHERE o_orderkey % 4 = 0 AND o_totalprice IS NOT NULL
),
grid AS (SELECT unnest(range(0, 10)) AS bucket),
bb AS (
  SELECT CAST(least(9, greatest(0, floor((v - 0.0) / 60000.0))) AS INT) AS bucket,
         count(*) AS n
  FROM base GROUP BY 1
),
cc AS (
  SELECT CAST(least(9, greatest(0, floor((v - 0.0) / 60000.0))) AS INT) AS bucket,
         count(*) AS n
  FROM cur GROUP BY 1
),
j AS (
  SELECT CAST(g.bucket AS INT) AS bucket,
         coalesce(bb.n, 0) AS n_base, coalesce(cc.n, 0) AS n_cur
  FROM grid g LEFT JOIN bb ON bb.bucket = g.bucket
              LEFT JOIN cc ON cc.bucket = g.bucket
),
t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM j)
SELECT bucket, n_base, n_cur,
       round(
         ((n_base + 1) / CAST(tb + 10 AS DOUBLE)
          - (n_cur + 1) / CAST(tc + 10 AS DOUBLE))
         * (log2(CAST(n_base + 1 AS DOUBLE)) + log2(CAST(tc + 10 AS DOUBLE))
            - log2(CAST(n_cur + 1 AS DOUBLE)) - log2(CAST(tb + 10 AS DOUBLE))),
         6) AS psi_term
FROM j CROSS JOIN t ORDER BY bucket
"""

_QUANTIZE_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
),
q AS (
  SELECT vec_id, v, scale,
         CASE WHEN scale > 0
              THEN list_transform(v, x -> CAST(least(127, greatest(-127,
                     floor(x / scale + 0.5))) AS INT))
              ELSE list_transform(v, x -> 0) END AS qvec
  FROM s
)
SELECT vec_id, scale,
       CAST(list_sum(qvec) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qvec, q -> abs(q))) AS BIGINT) AS q_l1,
       list_max(qvec) AS q_max,
       list_max(list_transform(range(1, len(v) + 1),
                i -> abs(qvec[i] * scale - v[i]))) <= scale * 0.5 + 1e-12 AS err_ok
FROM q ORDER BY vec_id
"""

_QRECALL_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
qrow AS (SELECT v FROM base WHERE vec_id = 0),
qs AS (SELECT v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM qrow),
qrec AS (
  SELECT CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(least(127, greatest(-127,
                     floor(x / s + 0.5))) AS INT) * s)
              ELSE list_transform(v, x -> 0.0) END AS rv
  FROM qs
),
cs AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
  FROM base WHERE vec_id <> 0
),
crec AS (
  SELECT vec_id, CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(least(127, greatest(-127,
                     floor(x / s + 0.5))) AS INT) * s)
              ELSE list_transform(v, x -> 0.0) END AS rv
  FROM cs
),
exact10 AS (
  SELECT b.vec_id FROM base b, qrow
  WHERE b.vec_id <> 0
  ORDER BY round(list_cosine_similarity(b.v, qrow.v), 6) DESC, b.vec_id LIMIT 10
),
approx10 AS (
  SELECT c.vec_id FROM crec c, qrec
  ORDER BY round(list_cosine_similarity(c.rv, qrec.rv), 6) DESC, c.vec_id LIMIT 10
)
SELECT CAST(count(*) AS BIGINT) AS n_overlap,
       round(count(*) / 10.0, 6) AS recall
FROM (SELECT vec_id FROM exact10 INTERSECT SELECT vec_id FROM approx10)
"""

_STREAM_DRIFT_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour_start,
         CAST(least(9, greatest(0, floor((value - 0.0) / 50.0))) AS INT) AS bucket,
         count(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT bucket, sum(n) AS n_all FROM h GROUP BY 1),
wt AS (SELECT hour_start, sum(n) AS w FROM h GROUP BY 1),
g AS (SELECT sum(n) AS t FROM h)
SELECT h.hour_start, h.bucket, h.n,
       round(
         ((h.n + 1) / CAST(w + 10 AS DOUBLE)
          - (n_all + 1) / CAST(t + 10 AS DOUBLE))
         * (log2(CAST(h.n + 1 AS DOUBLE)) + log2(CAST(t + 10 AS DOUBLE))
            - log2(CAST(n_all + 1 AS DOUBLE)) - log2(CAST(w + 10 AS DOUBLE))),
         6) AS psi_term
FROM h JOIN tot USING (bucket) JOIN wt USING (hour_start) CROSS JOIN g
ORDER BY hour_start, bucket
"""

_DUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents WHERE text IS NOT NULL
),
pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 8 + 2)) AS i FROM toks),
grams AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         md5(array_to_string(tk[i:i+7], ' ')) AS h
  FROM pos
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams WHERE h IN (SELECT h FROM dup)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos <= lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
              THEN 0 ELSE 1 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM brk
)
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + 7 AS INT) AS span_end,
       CAST(max(pos) + 7 - min(pos) + 1 AS INT) AS span_tokens
FROM isl GROUP BY doc_id, g ORDER BY doc_id, span_start
"""

# WAV payload length is closed-form (44-byte RIFF/fmt preamble + 2
# bytes per 16-bit sample), so the frame fan-out and per-frame byte
# counts are derivable from doc_id with no binary in the oracle at all
_FRAME_SAMPLE_SQL = """
WITH p AS (
  SELECT doc_id, 44 + 2 * (1 + (doc_id % 97) * 16) AS len FROM documents
),
f AS (
  SELECT doc_id, len,
         unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT), 3)) AS frame_idx
  FROM p
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(least(64, len - frame_idx * 64) AS INT) AS frame_len
FROM f ORDER BY doc_id, frame_idx
"""


def oracle_sql() -> dict[str, str]:
    """Per-entry DuckDB oracle SQL. EVERY string is routed through
    ``TX.pin_ws_oracle`` on the way out (see the return at the bottom):
    the readable ``'\\s+'`` tokenizer literal each oracle writes is
    rewritten to the ONE pinned explicit whitespace class that
    ``tokens()`` splits on — Java's \\s and RE2's \\s disagree on
    \\x0B, which is exactly the r11 driver-red class
    (vocab_growth_documents / strip_boilerplate_documents). A bare \\s
    anywhere else in an oracle raises at registry-build time."""
    sky = _sky_oracle()
    sqls = {
        # round-9 additions
        "distribution_drift_orders": _DRIFT_SQL,
        "duplicate_spans_documents": _DUP_SPANS_SQL,
        "streaming_drift_replay": _STREAM_DRIFT_SQL,
        "quantize_check_embeddings": _QUANTIZE_SQL,
        "quantized_recall_check": _QRECALL_SQL,
        "zorder_scan_check": """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
FROM lineitem
WHERE l_extendedprice >= 20000 AND l_extendedprice < 30000
  AND l_quantity >= 10 AND l_quantity < 20
ORDER BY l_orderkey, l_linenumber
""",
        "weighted_sample_documents": """
WITH s AS (
  SELECT doc_id, n_chars,
         ln((('0x' || substr(md5(text), 1, 15))::BIGINT % 4503599627370496 + 1)
            / 4503599627370497.0) / n_chars AS pri
  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
),
top AS (SELECT doc_id, n_chars FROM s ORDER BY pri DESC, doc_id LIMIT 50)
SELECT doc_id, n_chars FROM top ORDER BY doc_id
""",
        "zipf_fit_tokens": r"""
WITH tf AS (
  SELECT t AS tok, count(*) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents WHERE text IS NOT NULL) WHERE t <> '' GROUP BY t
),
top AS (SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok LIMIT 200),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM top),
q AS (
  SELECT CAST(round(log2(rank) * 1000000) AS HUGEINT) AS x,
         CAST(round(log2(cnt) * 1000000) AS HUGEINT) AS y
  FROM r
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
  FROM q
),
d AS (
  SELECT CAST(n AS DOUBLE) AS nd, n,
         CAST(sx AS DOUBLE) / 1000000.0 AS sx, CAST(sy AS DOUBLE) / 1000000.0 AS sy,
         CAST(sxx AS DOUBLE) / 1000000000000.0 AS sxx,
         CAST(sxy AS DOUBLE) / 1000000000000.0 AS sxy,
         CAST(syy AS DOUBLE) / 1000000000000.0 AS syy
  FROM m
)
SELECT CAST(n AS BIGINT) AS n,
       round((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 9) AS slope,
       round((sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd, 9) AS intercept,
       round(((nd*sxy - sx*sy) * (nd*sxy - sx*sy))
             / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)), 9) AS r2
FROM d
""",
        "tfidf_keywords_documents": _TFIDF_SQL,
        "max_concurrency_events": _MAX_CONCURRENCY_SQL,
        "incremental_dedup_documents": _INCREMENTAL_DEDUP_SQL,
        "frame_sample_check": _FRAME_SAMPLE_SQL,
        # round-8 additions
        "linreg_lineitem": _LINREG_SQL,
        "corr_lineitem": _CORR_SQL,
        "zscore_outliers_events": _ZSCORE_SQL,
        "triangle_count_copurchase": _TRIANGLE_SQL,
        "bm25_search_documents": _BM25_SQL,
        # index-backed access path, identical contract
        "bm25_index_search_documents": _BM25_SQL,
        "pmi_collocations_documents": _PMI_SQL,
        "bpe_merges_check": _BPE_CHECK_SQL,
        "bpe_encode_check": _BPE_ENCODE_SQL,
        "kcore_check": """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(4 AS BIGINT)), (1, 4), (2, 4), (3, 4), (4, 4),
  (30, 3), (31, 3), (32, 3), (33, 3)
) v(node, core_degree)
""",
        "percentile_ranks_lineitem": """
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS value_q
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
g AS (SELECT value_q, count(*) AS n_rows_at FROM v GROUP BY value_q),
r AS (
  SELECT value_q, n_rows_at,
         CAST(coalesce(sum(n_rows_at) OVER (ORDER BY value_q
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_smaller,
         CAST(sum(n_rows_at) OVER (ORDER BY value_q
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_le
  FROM g
),
t AS (SELECT CAST(sum(n_rows_at) AS BIGINT) AS n FROM g)
SELECT value_q, n_rows_at, n_smaller,
       round(CAST(n_smaller AS DOUBLE) / greatest(n - 1, 1), 9) AS percent_rank,
       round(CAST(n_le AS DOUBLE) / greatest(n, 1), 9) AS cume_dist
FROM r CROSS JOIN t
""",
        "bloom_semi_join_orders": """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
""",
        "seasonal_anomalies_events": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
),
d2 AS (SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n_events,
              dayofweek(d) + 1 AS dow
       FROM daily),
ds AS (
  SELECT event_type, dow, count(*) AS dow_days,
         CAST(sum(n_events) AS BIGINT) AS dow_total
  FROM d2 GROUP BY event_type, dow
)
SELECT d2.event_type, d2.day, d2.dow, d2.n_events, ds.dow_days, ds.dow_total,
       CASE WHEN d2.n_events * ds.dow_days * 1 > 2 * ds.dow_total THEN 'high'
            WHEN d2.n_events * ds.dow_days * 2 < 1 * ds.dow_total THEN 'low'
            ELSE NULL END AS anomaly
FROM d2 JOIN ds USING (event_type, dow)
ORDER BY d2.event_type, d2.day
""",
        "salted_join_agg_nation": """
SELECT c_nationkey, count(o_totalprice) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS max_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
        "bfs_hops_copurchase": """
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0
),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
sources AS (SELECT DISTINCT l_partkey AS node FROM li WHERE l_partkey % 97 = 0),
w(node, hop) AS (
  SELECT node, 0 FROM sources
  UNION
  SELECT e.dst, w.hop + 1 FROM w JOIN edges e ON e.src = w.node WHERE w.hop < 4
)
SELECT node, CAST(min(hop) AS INT) AS hop FROM w GROUP BY node
""",
        "shortest_paths_copurchase": """
WITH RECURSIVE li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0
),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
we AS (SELECT src, dst, 1 + (src + dst) % 7 AS w FROM edges),
sources AS (SELECT DISTINCT l_partkey AS node FROM li WHERE l_partkey % 97 = 0),
p(node, hop, cost) AS (
  SELECT node, 0, CAST(0 AS BIGINT) FROM sources
  UNION
  SELECT e.dst, p.hop + 1, CAST(p.cost + e.w AS BIGINT)
  FROM p JOIN we e ON e.src = p.node WHERE p.hop < 3
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM p GROUP BY node
""",
        "leakage_safe_split_documents": """
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d
),
comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
lab AS (
  SELECT d.doc_id AS id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
b AS (
  SELECT id, cluster_id,
         ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bk
  FROM lab
)
SELECT id, cluster_id,
       CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
FROM b
""",
        "negative_pairs_documents": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
np AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
),
base AS (
  SELECT doc_id AS id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
  FROM documents
),
b AS (SELECT id, h, h % 16 AS bk FROM base),
slate AS (
  SELECT bk, id AS neg_id, h AS neg_h FROM (
    SELECT bk, id, h, row_number() OVER (PARTITION BY bk ORDER BY h, id) AS rn
    FROM b) WHERE rn <= 3
),
anchors AS (SELECT id, h, (bk + 1) % 16 AS sbk FROM b),
cand AS (
  SELECT a.id, s.neg_id FROM anchors a JOIN slate s ON s.bk = a.sbk
  WHERE a.id <> s.neg_id AND a.h <> s.neg_h
)
SELECT id, neg_id FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM np p
  WHERE (p.id_a = c.id AND p.id_b = c.neg_id)
     OR (p.id_a = c.neg_id AND p.id_b = c.id)
)
""",
        "target_encode_events": """
WITH g AS (
  SELECT event_type, sum(CAST(value AS DECIMAL(20,4))) AS s, count(value) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN e.value IS NULL THEN CAST(g.s AS DOUBLE) / g.n
            WHEN g.n = 1 THEN NULL
            ELSE CAST(g.s - CAST(e.value AS DECIMAL(20,4)) AS DOUBLE) / (g.n - 1)
       END AS loo_mean
FROM events e LEFT JOIN g ON e.event_type = g.event_type
""",
        "embedding_dim_stats": """
WITH u AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS vq
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT dim, count(*) AS n,
       -- engine-exact HALF-UP mean (exact_round_div twin): rounded
       -- scaled integer via exact HUGEINT floor-division, then one
       -- float step on the identical integer
       (CASE WHEN sum(vq) < 0 THEN -1 ELSE 1 END)
         * CAST((2 * abs(CAST(sum(vq) AS HUGEINT)) * 1000000000
                 + CAST(1000000 AS HUGEINT) * count(*))
                // (2 * CAST(1000000 AS HUGEINT) * count(*)) AS DOUBLE)
         / 1000000000.0 AS mean,
       round(sqrt(greatest(
         CAST(sum(vq::HUGEINT * vq) AS DOUBLE) / (1000000.0 * 1000000.0) / count(*)
         - pow(CAST(sum(vq) AS DOUBLE) / 1000000.0 / count(*), 2), 0.0)), 9) AS std,
       CAST(min(vq) AS DOUBLE) / 1000000.0 AS vmin,
       CAST(max(vq) AS DOUBLE) / 1000000.0 AS vmax
FROM u GROUP BY dim
""",
        "gram_matrix_embeddings": """
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS vq
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT a.i AS i, b.i AS j,
       round(CAST(sum(a.vq::HUGEINT * b.vq) AS DOUBLE)
             / (1000000.0 * 1000000.0), 6) AS gram
FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
""",
        "vocab_growth_documents": """
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
tk AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
fs AS (SELECT tok, min(doc_id) AS f FROM tk GROUP BY tok),
vb AS (
  SELECT greatest((f * 10 + m - 1) // m, 1) AS k, count(*) AS nv
  FROM fs, mx GROUP BY 1
),
dc AS (SELECT doc_id, count(*) AS nt FROM tk GROUP BY doc_id),
db AS (
  SELECT greatest((doc_id * 10 + m - 1) // m, 1) AS k,
         count(*) AS nd, sum(nt) AS ntk
  FROM dc, mx GROUP BY 1
),
ks AS (SELECT r.k AS k, (m * r.k) // 10 AS cutoff_id
       FROM mx, generate_series(1, 10) r(k))
SELECT ks.k AS k, ks.cutoff_id,
       -- CAST: sum() returns HUGEINT, which duckdb materializes as
       -- float64 through pandas — int/float-invisible to a `==`
       -- comparator but fatal to a value-hash (the r11/r12 driver-red
       -- root cause; tools/dtype_audit.py)
       CAST(sum(coalesce(db.nd, 0)) OVER w AS BIGINT) AS n_docs,
       CAST(sum(coalesce(db.ntk, 0)) OVER w AS BIGINT) AS n_tokens,
       CAST(sum(coalesce(vb.nv, 0)) OVER w AS BIGINT) AS n_vocab
FROM ks LEFT JOIN vb ON vb.k = ks.k LEFT JOIN db ON db.k = ks.k
WINDOW w AS (ORDER BY ks.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY k
""",
        "covariance_embeddings": """
WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS vq
  FROM embeddings WHERE embedding IS NOT NULL
),
p AS (
  SELECT a.i AS i, b.i AS j, sum(a.vq::HUGEINT * b.vq) AS pp, count(*) AS n
  FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i GROUP BY 1, 2
),
s AS (SELECT i, sum(vq) AS sv FROM u GROUP BY i)
SELECT p.i AS i, p.j AS j,
       round(CAST(p.n::HUGEINT * p.pp - si.sv::HUGEINT * sj.sv AS DOUBLE)
             / (CAST(p.n AS DOUBLE) * p.n * 1000000.0 * 1000000.0), 9) AS cov
FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
""",
        "skew_report_events": """
WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS nrows, count(*) AS nkeys, max(c) AS mx,
         sum(c::HUGEINT * c) AS c2,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single
  FROM c
),
t AS (
  SELECT CAST(sum(c) AS BIGINT) AS topc FROM (
    SELECT c FROM c ORDER BY c DESC, user_id NULLS FIRST LIMIT 10)
)
SELECT nrows AS n_rows, nkeys AS n_keys, mx AS max_count,
       round(CAST(mx AS DOUBLE) / CAST(nrows AS DOUBLE), 9) AS max_share,
       topc AS topk_count,
       round(CAST(topc AS DOUBLE) / CAST(nrows AS DOUBLE), 9) AS topk_share,
       single AS singleton_keys,
       round(CAST(nrows AS DOUBLE) / CAST(nkeys AS DOUBLE), 9) AS avg_count,
       round(sqrt(greatest(
           CAST(c2 AS DOUBLE) / CAST(nkeys AS DOUBLE)
           - pow(CAST(nrows AS DOUBLE) / CAST(nkeys AS DOUBLE), 2), 0.0))
         / (CAST(nrows AS DOUBLE) / CAST(nkeys AS DOUBLE)), 9) AS count_cv
FROM m, t
""",
        "props_stats_events": """
WITH v AS (
  SELECT event_type,
         CAST(round(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
                    * 10000) AS BIGINT) AS vq
  FROM events
)
SELECT event_type, count(*) AS n_rows, count(vq) AS n_present,
       count(DISTINCT vq) AS n_distinct,
       CAST(sum(vq) AS DOUBLE) / 10000.0 AS sum,
       round(CAST(sum(vq) AS DOUBLE) / 10000.0
             / CAST(count(vq) AS DOUBLE), 9) AS mean,
       CAST(min(vq) AS DOUBLE) / 10000.0 AS vmin,
       CAST(max(vq) AS DOUBLE) / 10000.0 AS vmax
FROM v GROUP BY event_type
""",
        "cm_rollup_check": _CM_PROBE_SQL,
        # the streaming fold is linear, so its final state answers the
        # SAME probe queries as the batch-built sketch — one oracle
        "streaming_sketch_replay": _CM_PROBE_SQL,
        "hist_quantile_rollup_check": """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT month,
         least(greatest(cents // 100000, 0), 599) AS bucket,
         count(*) AS c
  FROM o GROUP BY month, bucket
),
r AS (
  SELECT month, bucket, c,
         sum(c) OVER (PARTITION BY month ORDER BY bucket) AS run,
         sum(c) OVER (PARTITION BY month) AS n
  FROM b
),
q AS (
  SELECT month, max(n) AS n,
         min(CASE WHEN run >= (n * 1 + 1) // 2 THEN bucket END) AS b50,
         min(CASE WHEN run >= (n * 9 + 9) // 10 THEN bucket END) AS b90,
         min(CASE WHEN run >= (n * 99 + 99) // 100 THEN bucket END) AS b99
  FROM r GROUP BY month
)
SELECT month, CAST(n AS BIGINT) AS n_orders,
       CAST(b50 * 100000 AS BIGINT) AS p50_edge,
       CAST(b90 * 100000 AS BIGINT) AS p90_edge,
       CAST(b99 * 100000 AS BIGINT) AS p99_edge
FROM q ORDER BY month
""",
        "cusum_events": """
WITH d AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
  FROM events GROUP BY event_type, day
),
t AS (
  SELECT event_type, day, n_events,
         sum(n_events) OVER (PARTITION BY event_type) AS tot,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
s AS (
  SELECT event_type, day, n_events,
         sum(n * n_events - tot)
           OVER (PARTITION BY event_type ORDER BY day) AS run
  FROM t
),
c AS (
  SELECT event_type, day, n_events,
         run - least(min(run) OVER (PARTITION BY event_type ORDER BY day),
                     0) AS cusum_scaled
  FROM s
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cusum_scaled DESC, day) AS rnk
  FROM c
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       CAST(cusum_scaled AS BIGINT) AS cusum_scaled
FROM rk WHERE rnk <= 3
ORDER BY event_type, cusum_scaled DESC, day
""",
        "rfm_segments_customers": """
WITH per AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monet_cents
  FROM orders GROUP BY o_custkey
),
n AS (SELECT count(*) AS nn FROM per),
r AS (
  SELECT o_custkey,
         row_number() OVER (ORDER BY last_order DESC, o_custkey) AS r_rn,
         row_number() OVER (ORDER BY freq DESC, o_custkey) AS f_rn,
         row_number() OVER (ORDER BY monet_cents DESC, o_custkey) AS m_rn
  FROM per
),
s AS (
  SELECT CAST(1 + ((r_rn - 1) * 5) // nn AS INT) AS r_score,
         CAST(1 + ((f_rn - 1) * 5) // nn AS INT) AS f_score,
         CAST(1 + ((m_rn - 1) * 5) // nn AS INT) AS m_score
  FROM r CROSS JOIN n
)
SELECT r_score, f_score, m_score, count(*) AS n_customers
FROM s GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
        "skipgram_cooc_documents": """
WITH tk AS (
  SELECT doc_id, unnest(range(1, len(t)+1)) AS pos, unnest(t) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents)
),
pr AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM tk a JOIN tk b
    ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos + 1 AND a.pos + 3
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
FROM pr GROUP BY w1, w2
ORDER BY cnt DESC, w1, w2 LIMIT 30
""",
        "interval_union_events": """
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_e
  FROM iv
),
f AS (
  SELECT user_id, s, e,
         CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END AS new_isl
  FROM m
),
ii AS (
  SELECT user_id, s, e,
         sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS isl
  FROM f
),
pi AS (SELECT user_id, isl, min(s) AS s0, max(e) AS e1
       FROM ii GROUP BY user_id, isl)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(e1 - s0) AS BIGINT) AS covered_s
FROM pi GROUP BY user_id ORDER BY user_id
""",
        "weighted_deciles_lineitem": """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
pv AS (
  SELECT l_returnflag, cents, sum(qty) AS w
  FROM li GROUP BY l_returnflag, cents
),
c AS (
  SELECT l_returnflag, cents, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag,
       CAST(max(tot) AS BIGINT) AS total_weight,
       CAST(min(CASE WHEN cum * 10 >= tot * 1 THEN cents END) AS BIGINT) AS wq_1_10,
       CAST(min(CASE WHEN cum * 2 >= tot * 1 THEN cents END) AS BIGINT) AS wq_1_2,
       CAST(min(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS BIGINT) AS wq_9_10
FROM c GROUP BY l_returnflag ORDER BY l_returnflag
""",
        "class_scatter_embeddings": """
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding)::DOUBLE * 1000000) AS HUGEINT) AS q
  FROM embeddings WHERE embedding IS NOT NULL
),
per AS (
  SELECT label, i, count(*) AS cnt, sum(q) AS s, sum(q*q) AS sq
  FROM u GROUP BY label, i
),
lab AS (
  SELECT label, max(cnt) AS n, sum(sq) AS ssq, sum(s*s) AS s2
  FROM per GROUP BY label
),
gm AS (SELECT i, sum(s) AS sg FROM per GROUP BY i),
tot AS (SELECT sum(n) AS nn FROM lab),
bt AS (
  SELECT per.label, lab.n, tot.nn,
         sum((tot.nn * per.s - lab.n * gm.sg)
             * (tot.nn * per.s - lab.n * gm.sg)) AS bnum
  FROM per JOIN gm USING (i) JOIN lab USING (label) CROSS JOIN tot
  GROUP BY per.label, lab.n, tot.nn
)
SELECT lab.label, CAST(lab.n AS BIGINT) AS n,
       round(CAST(lab.n * lab.ssq - lab.s2 AS DOUBLE)
             / CAST(lab.n AS DOUBLE) / CAST(lab.n AS DOUBLE)
             / 1000000000000.0, 9) AS within_var,
       round(CAST(bt.bnum AS DOUBLE)
             / (CAST(bt.n AS DOUBLE) * CAST(bt.nn AS DOUBLE))
             / (CAST(bt.n AS DOUBLE) * CAST(bt.nn AS DOUBLE))
             / 1000000000000.0, 9) AS between_dist2
FROM lab JOIN bt USING (label)
ORDER BY lab.label
""",
        "kmv_setops_check": """
WITH s AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
t AS (SELECT DISTINCT event_type FROM s),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM t a JOIN t b ON a.event_type < b.event_type
),
m AS (
  SELECT p.type_a, p.type_b,
         count(DISTINCT s.user_id) AS n_union
  FROM p JOIN s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b
),
ca AS (SELECT event_type, count(*) AS c FROM s GROUP BY event_type)
SELECT type_a, type_b,
       CAST(n_union AS BIGINT) AS n_union,
       CAST(n_union - cb.c AS BIGINT) AS n_a_only,
       CAST(n_union - ca.c AS BIGINT) AS n_b_only
FROM m JOIN ca ON ca.event_type = type_a JOIN ca cb ON cb.event_type = type_b
ORDER BY type_a, type_b
""",
        "kmv_overlap_check": """
WITH s AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
t AS (SELECT DISTINCT event_type FROM s),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM t a JOIN t b ON a.event_type < b.event_type
),
o AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS c
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY ta, tb
)
SELECT type_a, type_b, CAST(coalesce(c, 0) AS BIGINT) AS n_common_users
FROM p LEFT JOIN o ON ta = type_a AND tb = type_b
ORDER BY type_a, type_b
""",
        "rrf_fusion_documents": """
WITH tok AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tokens
  FROM dl
),
tf AS (
  SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE tok IN ('hash', 'merge', 'spark', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.id,
         (log2(CAST(2*c.n_docs + 2 AS DOUBLE)) - log2(CAST(2*d.df_t + 1 AS DOUBLE)))
         * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
            / (CAST(tf.tf AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
               * (1.0 - CAST(0.75 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE)
                  * (CAST(dl.dl AS DOUBLE) * CAST(c.n_docs AS DOUBLE)
                     / CAST(c.total_tokens AS DOUBLE))))) AS contrib
  FROM tf JOIN dfreq d USING (tok) JOIN dl USING (id) CROSS JOIN corpus c
),
perdoc AS (
  SELECT id,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(contrib))),
                           (a, b) -> a + b), 6) AS score
  FROM contrib GROUP BY id
),
lex AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rn
  FROM perdoc ORDER BY score DESC, id LIMIT 200
),
cov0 AS (
  SELECT id,
         count(DISTINCT CASE WHEN tok IN ('hash', 'merge', 'spark', 'window')
                             THEN tok END) AS n_hits,
         count(*) AS dl
  FROM tok GROUP BY id
),
cov AS (
  SELECT id, row_number() OVER (ORDER BY n_hits DESC, dl, id) AS rn
  FROM cov0 WHERE n_hits > 0 ORDER BY n_hits DESC, dl, id LIMIT 200
),
u AS (
  SELECT id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(rn AS DOUBLE)) AS c
  FROM lex
  UNION ALL
  SELECT id, CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(rn AS DOUBLE)) AS c
  FROM cov
),
f AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_lists,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(c))),
                           (a, b) -> a + b), 6) AS rrf_score
  FROM u GROUP BY id
)
SELECT id AS doc_id, n_lists, rrf_score
FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20
""",
        "trend_by_type_events": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY event_type, day
),
q AS (
  SELECT event_type,
         CAST(datediff('day', DATE '2024-01-01', day) AS HUGEINT) AS x,
         CAST(n_events AS HUGEINT) AS y
  FROM daily
),
m AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
  FROM q GROUP BY event_type
),
d AS (
  SELECT event_type, CAST(n AS DOUBLE) AS nd, n,
         CAST(sx AS DOUBLE) / 1.0 AS sx, CAST(sy AS DOUBLE) / 1.0 AS sy,
         CAST(sxx AS DOUBLE) / 1.0 AS sxx, CAST(sxy AS DOUBLE) / 1.0 AS sxy,
         CAST(syy AS DOUBLE) / 1.0 AS syy
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(CASE WHEN nd*sxx - sx*sx > 0
                  THEN (nd*sxy - sx*sy) / (nd*sxx - sx*sx) END, 9) AS slope,
       round(CASE WHEN nd*sxx - sx*sx > 0
                  THEN (sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd
             END, 9) AS intercept,
       round(CASE WHEN nd*sxx - sx*sx > 0 AND nd*syy - sy*sy > 0
                  THEN ((nd*sxy - sx*sy) * (nd*sxy - sx*sy))
                       / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)) END, 9) AS r2
FROM d ORDER BY event_type
""",
        "version_diff_check": """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) = 1995
)
SELECT 'added' AS status, count(*) AS n FROM base WHERE k % 53 = 0
UNION ALL
SELECT 'changed', count(*) FROM base WHERE k % 97 = 0
UNION ALL
SELECT 'unchanged', count(*) FROM base WHERE k % 97 <> 0
ORDER BY status
""",
        "weighted_median_lineitem": """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
),
pv AS (
  SELECT l_returnflag, cents, sum(qty) AS w
  FROM li GROUP BY l_returnflag, cents
),
c AS (
  SELECT l_returnflag, cents, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM pv
)
SELECT l_returnflag,
       CAST(min(cents) AS BIGINT) AS w_median,
       CAST(max(tot) AS BIGINT) AS total_weight
FROM c WHERE cum * 2 >= tot
GROUP BY l_returnflag ORDER BY l_returnflag
""",
        "time_travel_check": """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) = 1995
),
v2 AS (
  SELECT k, CASE WHEN k % 97 = 0 THEN cents + 500 ELSE cents END AS cents
  FROM base
  UNION ALL
  SELECT k + 100000000 AS k, cents FROM base WHERE k % 53 = 0
)
SELECT 1 AS version, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM base
UNION ALL
SELECT 2, count(*), CAST(sum(cents) AS BIGINT) FROM v2
ORDER BY version
""",
        "bmp_pixel_check": """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 12 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (299 * ((doc_id + 5*x + 11*y) % 256)
          + 587 * ((3*doc_id + 7*x + y) % 256)
          + 114 * ((2*doc_id + x + 13*y) % 256)) // 1000 AS v
  FROM d, range(0, 16) r1(x), range(0, 12) r2(y)
  WHERE x < w AND y < h
)
SELECT doc_id,
       CAST(max(w) AS INTEGER) AS width,
       CAST(max(h) AS INTEGER) AS height,
       CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(min(v) AS INTEGER) AS pixel_min,
       CAST(max(v) AS INTEGER) AS pixel_max
FROM px GROUP BY doc_id ORDER BY doc_id
""",
        "impute_values_events": """
WITH e AS (
  SELECT event_type,
         CASE WHEN event_id % 13 = 0 THEN NULL
              ELSE CAST(round(value * 10000) AS BIGINT) END AS q
  FROM events
),
m AS (
  SELECT event_type, CAST(quantile_cont(q, 0.5) * 2 AS BIGINT) AS med_x2
  FROM e WHERE q IS NOT NULL GROUP BY event_type
),
j AS (
  SELECT e.event_type, m.med_x2,
         CASE WHEN q IS NULL THEN 1 ELSE 0 END AS was_null,
         coalesce(2 * q, med_x2) AS q2
  FROM e JOIN m USING (event_type)
)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(was_null) AS BIGINT) AS n_imputed,
       round(CAST(max(med_x2) AS DOUBLE) / 2 / 10000, 6) AS median_value,
       CAST(sum(q2) AS BIGINT) AS sum_q2
FROM j GROUP BY event_type ORDER BY event_type
""",
        "grouped_topk_orders": """
WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
r AS (
  SELECT o_custkey, o_orderkey, cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY cents DESC, o_orderkey DESC) AS rk
  FROM o
)
SELECT o_custkey, CAST(rk AS INT) AS rank, o_orderkey, cents
FROM r WHERE rk <= 3 ORDER BY o_custkey, rank
""",
        "ab_test_events": """
WITH e AS (
  SELECT event_type,
         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CAST(round(value * 10000) AS HUGEINT) AS q
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT event_type, arm, count(*) AS n, sum(q) AS s, sum(q*q) AS sxx
  FROM e GROUP BY event_type, arm
),
st AS (
  SELECT event_type, arm, n,
         CAST(s AS DOUBLE) / n / 10000.0 AS m,
         (CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
           / (n - 1) / 1e8 AS v
  FROM g
)
SELECT a.event_type, a.n AS n_a, b.n AS n_b,
       round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS z_stat
FROM st a JOIN st b
  ON a.event_type = b.event_type AND a.arm = 'A' AND b.arm = 'B'
ORDER BY a.event_type
""",
        "item_cf_parts": """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
ic AS (SELECT i, count(*) AS c FROM bi GROUP BY i),
p AS (
  SELECT l.i AS item_a, r.i AS item_b, CAST(count(*) AS BIGINT) AS support
  FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
  GROUP BY item_a, item_b HAVING count(*) >= 3
)
SELECT item_a, item_b, support,
       round(CAST(support AS DOUBLE)
             / sqrt(CAST(ca.c * cb.c AS DOUBLE)), 9) AS cosine
FROM p JOIN ic ca ON ca.i = item_a JOIN ic cb ON cb.i = item_b
ORDER BY cosine DESC, item_a, item_b LIMIT 50
""",
        "winnow_fingerprints_documents": """
WITH tk AS (
  SELECT doc_id, unnest(range(1, len(t)+1)) AS pos, unnest(t) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents)
),
g AS (
  SELECT a.doc_id, a.pos,
         ('0x' || substr(md5(a.tok || ' ' || b.tok || ' ' || c.tok),
                         1, 15))::BIGINT AS h
  FROM tk a
  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
w AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM g
),
sel AS (SELECT DISTINCT doc_id, mh AS h FROM w WHERE wn = 4),
short AS (
  SELECT g.doc_id, min(h) AS h
  FROM g JOIN n USING (doc_id) WHERE n.ng < 4 GROUP BY g.doc_id
),
fp AS (SELECT doc_id, h FROM sel UNION SELECT doc_id, h FROM short)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       min(h) AS min_fp, max(h) AS max_fp
FROM fp GROUP BY doc_id ORDER BY doc_id
""",
        "attribution_events": """
WITH m AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN struct_pack(ts := ts, id := event_id) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
  FROM events
)
SELECT event_id, user_id, ts,
       CASE WHEN keep THEN lt.id END AS touch_event_id,
       CASE WHEN keep THEN lt.ts END AS touch_ts,
       CASE WHEN keep THEN round((epoch_us(ts) - epoch_us(lt.ts)) / 1000000.0, 6)
            END AS lag_seconds
FROM (
  SELECT *, lt IS NOT NULL
            AND lt.ts >= ts - INTERVAL 7 DAY AS keep
  FROM m WHERE event_type = 'purchase'
)
""",
        "containment_pairs_documents": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(a.s) AS BIGINT) AS n_a, CAST(len(b.s) AS BIGINT) AS n_b,
         CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS shared
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_a, n_b, shared,
       CAST(shared AS DOUBLE) / least(n_a, n_b) AS containment
FROM pairs
WHERE CAST(shared AS DOUBLE) / least(n_a, n_b) >= 0.8
""",
        "k_anonymity_customers": """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS cs
  FROM customer GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT cs AS class_size,
       count(*) AS n_classes,
       CAST(cs * count(*) AS BIGINT) AS n_rows,
       cs < 5 AS at_risk
FROM cls GROUP BY cs ORDER BY cs
""",
        "length_buckets_documents": """
WITH t AS (
  SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT n, CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                 WHEN n <= 256 THEN 256 ELSE 512 END AS bucket_cap
  FROM t
)
SELECT bucket_cap,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN n <= bucket_cap THEN bucket_cap - n ELSE 0 END)
            AS BIGINT) AS padding_tokens,
       CAST(sum(CASE WHEN n > bucket_cap THEN n - bucket_cap ELSE 0 END)
            AS BIGINT) AS truncated_tokens
FROM b GROUP BY bucket_cap ORDER BY bucket_cap
""",
        "vocab_coverage_documents": """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
cnt AS (SELECT t, count(*) AS c FROM tok2 GROUP BY t),
voc AS (SELECT t FROM cnt ORDER BY c DESC, t ASC LIMIT 500),
per AS (
  SELECT doc_id, count(*) AS nt,
         CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM tok2 LEFT JOIN voc v USING (t) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(nt, 0) AS n_tokens,
       coalesce(oov, 0) AS oov_tokens,
       round(CAST(coalesce(oov, 0) AS DOUBLE)
             / greatest(coalesce(nt, 0), 1), 9) AS oov_rate
FROM documents d LEFT JOIN per USING (doc_id)
""",
        "temperature_mix_documents": """
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 10 < 6 THEN 'head'
              WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS stratum
  FROM documents
),
cnt AS (SELECT stratum, count(*) AS n FROM d GROUP BY stratum),
w AS (
  SELECT stratum, n, CAST(floor(sqrt(n)) AS BIGINT) AS wt
  FROM cnt WHERE floor(sqrt(n)) > 0
),
m AS (SELECT n AS nm, wt AS wm FROM w ORDER BY CAST(n AS DOUBLE)/wt, n, wt LIMIT 1),
thr AS (SELECT stratum, (1000000 * nm * wt) // (wm * n) AS t FROM w CROSS JOIN m)
SELECT d.doc_id, d.stratum
FROM d JOIN thr ON d.stratum = thr.stratum
WHERE ('0x' || substr(md5(d.text), 1, 15))::BIGINT % 1000000 < t
""",
        "analyze_approx_check": """
WITH s AS (
  SELECT 'o_orderkey' AS col_name,
         count(*) AS n_total,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         count(DISTINCT o_orderkey) AS ndv_exact
  FROM orders
  UNION ALL
  SELECT 'o_custkey', count(*),
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_custkey) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', count(*),
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_orderstatus) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*),
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_orderpriority) FROM orders
)
SELECT col_name, n_total, n_nulls, ndv_exact, TRUE AS within_bound
FROM s ORDER BY col_name
""",
        "analyze_orders": """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderdate, o_orderpriority
  FROM orders
),
s AS (
  SELECT 'o_orderkey' AS col_name, count(*) AS n_total,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         count(DISTINCT o_orderkey) AS ndv,
         CAST(min(o_orderkey) AS VARCHAR) AS min_str,
         CAST(max(o_orderkey) AS VARCHAR) AS max_str
  FROM t
  UNION ALL
  SELECT 'o_custkey', count(*),
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_custkey),
         CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
  FROM t
  UNION ALL
  SELECT 'o_orderstatus', count(*),
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_orderstatus),
         min(o_orderstatus), max(o_orderstatus)
  FROM t
  UNION ALL
  SELECT 'price_cents', count(*),
         CAST(sum(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT price_cents),
         CAST(min(price_cents) AS VARCHAR), CAST(max(price_cents) AS VARCHAR)
  FROM t
  UNION ALL
  SELECT 'o_orderdate', count(*),
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_orderdate),
         CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
  FROM t
  UNION ALL
  SELECT 'o_orderpriority', count(*),
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(DISTINCT o_orderpriority),
         min(o_orderpriority), max(o_orderpriority)
  FROM t
)
SELECT * FROM s
""",
        "twap_events": """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(round(value * 1000000) AS BIGINT) AS vq, event_id
  FROM events WHERE value IS NOT NULL
),
d AS (
  SELECT event_type, vq,
         lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us AS dt
  FROM o
),
a AS (
  SELECT event_type, count(*) AS n_obs,
         CAST(sum(dt) AS BIGINT) AS span_us,
         sum(CAST(vq AS HUGEINT) * dt) AS sw
  FROM d GROUP BY 1
)
SELECT event_type, n_obs, coalesce(span_us, 0) AS span_us,
       CASE WHEN span_us > 0
            THEN round(CAST(sw AS DOUBLE) / CAST(span_us AS DOUBLE)
                       / 1000000.0, 6)
       END AS twap
FROM a
""",
        "abc_parts": """
WITH pk AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS tq
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
r AS (
  SELECT l_partkey, tq,
         CAST(row_number() OVER (ORDER BY tq DESC, l_partkey) AS INTEGER)
           AS share_rank,
         sum(tq) OVER (ORDER BY tq DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(tq) OVER () AS gt
  FROM pk
)
SELECT l_partkey,
       CAST(tq AS BIGINT) AS total_q,
       CAST(cum AS BIGINT) AS cum_q,
       share_rank,
       CASE WHEN cum * 100 <= gt * 80 THEN 'A'
            WHEN cum * 100 <= gt * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM r
""",
        "resize_check": """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 16 AS sw, 1 + doc_id % 12 AS sh FROM documents
),
sxy AS (
  SELECT doc_id, (ox * sw) // 8 AS sx, (oy * sh) // 6 AS sy
  FROM d, range(0, 8) r1(ox), range(0, 6) r2(oy)
),
px AS (
  SELECT doc_id, 'gray' AS src,
         (doc_id + 7 * sx + 13 * sy) % 256 AS v
  FROM sxy
  UNION ALL
  SELECT doc_id, 'rgb',
         (299 * ((doc_id + 5 * sx + 11 * sy) % 256)
          + 587 * ((3 * doc_id + 7 * sx + sy) % 256)
          + 114 * ((2 * doc_id + sx + 13 * sy) % 256)) // 1000
  FROM sxy
)
SELECT doc_id, src,
       CAST(8 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(min(v) AS INTEGER) AS pixel_min,
       CAST(max(v) AS INTEGER) AS pixel_max
FROM px GROUP BY doc_id, src
""",
        "novelty_documents": """
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
g AS (
  SELECT doc_id, CASE WHEN len(t) >= 3
      THEN list_distinct([array_to_string(t[i:i+2], ' ')
                          FOR i IN range(1, len(t) - 1)])
      ELSE CAST([] AS VARCHAR[]) END AS gs
  FROM tok
),
e AS (SELECT doc_id, unnest(gs) AS gr FROM g),
dfr AS (SELECT gr, count(*) AS d FROM e GROUP BY gr),
per AS (
  SELECT doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM e JOIN dfr USING (gr) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       coalesce(n_unique, 0) AS n_unique,
       CAST(coalesce(n_unique, 0) AS DOUBLE)
         / greatest(coalesce(n_grams, 0), 1) AS novelty
FROM tok t LEFT JOIN per USING (doc_id)
""",
        "fd_check_customer": """
SELECT 'c_custkey->c_nationkey' AS dependency,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(sum(greatest(cd - 1, 0)) AS BIGINT) AS extra_values
FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS cd
      FROM customer GROUP BY c_custkey)
UNION ALL
SELECT 'c_nationkey->c_mktsegment',
       count(*),
       CAST(sum(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(greatest(cd - 1, 0)) AS BIGINT)
FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS cd
      FROM customer GROUP BY c_nationkey)
""",
        "mutual_information_events": """
WITH base AS (
  SELECT event_type AS a, day(ts) AS b FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cxy FROM base GROUP BY 1, 2),
ca AS (SELECT a, CAST(sum(cxy) AS BIGINT) AS c1 FROM cells GROUP BY 1),
cb AS (SELECT b, CAST(sum(cxy) AS BIGINT) AS c2 FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(cxy) AS BIGINT) AS n, count(*) AS n_cells FROM cells),
terms AS (
  SELECT n, n_cells,
         CAST(cxy AS DOUBLE) * (log2(CAST(cxy AS DOUBLE))
                                + log2(CAST(n AS DOUBLE))
                                - log2(CAST(c1 AS DOUBLE))
                                - log2(CAST(c2 AS DOUBLE))) AS term
  FROM cells JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
)
SELECT n AS n_rows, n_cells,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(term))),
                         (x, y) -> x + y) / CAST(n AS DOUBLE), 6) AS mi_bits
FROM terms GROUP BY n, n_cells
""",
        "kmv_rollup_check": """
SELECT event_type,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
""",
        "streaming_maintenance_replay": """
WITH base AS (
  SELECT o_orderkey AS k,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) = 1995
),
merged AS (
  SELECT k, day,
         CASE WHEN k % 97 = 0
              THEN cents + 1000 * (1 + (k // 97) % 3)
              ELSE cents END AS cents
  FROM base
)
SELECT day, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged GROUP BY day
""",
        "incremental_rollup_check": """
WITH base AS (
  SELECT o_orderkey AS k,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
batch AS (
  SELECT k,
         CASE WHEN k % 194 = 0
              THEN strftime(CAST(day AS DATE) + 1, '%Y-%m-%d')
              ELSE day END AS day,
         cents + 1000 AS cents
  FROM base WHERE k % 97 = 0
),
merged AS (
  SELECT * FROM base WHERE k NOT IN (SELECT k FROM batch)
  UNION ALL SELECT * FROM batch
)
SELECT day, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged GROUP BY day
""",
        "golden_records_customers": """
WITH src AS (
  SELECT c_custkey % 500 AS cluster,
         c_mktsegment,
         CAST(c_nationkey AS VARCHAR) AS c_nationkey
  FROM customer
),
s AS (
  SELECT cluster, 'c_mktsegment' AS field, c_mktsegment AS value
  FROM src WHERE c_mktsegment IS NOT NULL
  UNION ALL
  SELECT cluster, 'c_nationkey', c_nationkey
  FROM src WHERE c_nationkey IS NOT NULL
),
c AS (
  SELECT cluster, field, value, count(*) AS votes FROM s GROUP BY 1, 2, 3
),
b AS (
  SELECT cluster, field, value,
         row_number() OVER (PARTITION BY cluster, field
                            ORDER BY votes DESC, value) AS rn
  FROM c
)
SELECT cluster,
       max(CASE WHEN field = 'c_mktsegment' THEN value END) AS c_mktsegment,
       max(CASE WHEN field = 'c_nationkey' THEN value END) AS c_nationkey
FROM b WHERE rn = 1 GROUP BY cluster
""",
        "autocorr_events": """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', ts::DATE) AS t,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type, l.lag, a.c AS xa, b.c AS xb
  FROM daily a
  JOIN (VALUES (1), (2), (3)) l(lag) ON TRUE
  JOIN daily b
    ON b.event_type = a.event_type AND b.t + l.lag = a.t
),
m AS (
  SELECT event_type, lag,
         count(*) AS n_pairs,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(xa AS HUGEINT)) AS sa,
         sum(CAST(xb AS HUGEINT)) AS sb,
         sum(CAST(xa AS HUGEINT) * xb) AS sab,
         sum(CAST(xa AS HUGEINT) * xa) AS saa,
         sum(CAST(xb AS HUGEINT) * xb) AS sbb
  FROM p GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       CASE WHEN (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
            THEN round(CAST(n * sab - sa * sb AS DOUBLE)
                       / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                              * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
       END AS acf
FROM m
""",
        "mad_outliers_orders": """
WITH x AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS xc
  FROM orders WHERE o_totalprice IS NOT NULL
),
m AS (
  SELECT g, CAST(2 * quantile_cont(xc, 0.5) AS BIGINT) AS med_x2
  FROM x GROUP BY g
),
d AS (
  SELECT x.g, CAST(abs(2 * xc - med_x2) AS BIGINT) AS d2, med_x2
  FROM x JOIN m USING (g)
),
mm AS (
  SELECT g, CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad_x4
  FROM d GROUP BY g
)
SELECT d.g AS o_orderpriority,
       count(*) AS n,
       CASE WHEN max(mad_x4) > 0 THEN
         CAST(sum(CASE WHEN 26980 * d2 > 70000 * mad_x4 THEN 1 ELSE 0 END)
              AS BIGINT)
       END AS n_outliers,
       max(med_x2) AS med_x2,
       max(mad_x4) AS mad_x4
FROM d JOIN mm USING (g)
GROUP BY d.g
""",
        "audio_features_check": """
WITH s AS (
  SELECT doc_id, unnest(range(0, 16 + doc_id % 17)) AS i FROM documents
),
v AS (
  SELECT doc_id, i, (doc_id * 31 + i * 7) % 2001 - 1000 AS x FROM s
),
a AS (
  SELECT doc_id, count(*) AS n, sum(x * x) AS ss, sum(x) AS sm,
         max(abs(x)) AS pk
  FROM v GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS INT) AS n_samples,
       CAST((1 + doc_id % 32) * 100 AS INT) AS sample_rate,
       CAST(pk AS INT) AS peak_abs,
       round(CAST(sm AS DOUBLE) / n, 6) AS mean_amp,
       round(sqrt(CAST(ss AS DOUBLE) / n), 6) AS rms
FROM a
""",
        "clustering_coefficient_copurchase": _CLUSTERING_SQL,
        "frequent_pairs_orders": _FREQ_PAIRS_SQL,
        "streaming_moments_replay": _STREAM_MOMENTS_SQL,
        "table_diff_orders": _TABLE_DIFF_SQL,
        "event_transitions_markov": _TRANSITIONS_SQL,
        "skyline_twophase": sky,
        "skyline_bruteforce": sky,
        "skyline_quadtree": sky,
        "skyline_blocked": sky,
        # SKYLINE OF string surface — same logical query, same oracle
        "skyline_sql_lineitem": sky,
        "skyline_grouped": _grouped_sky_oracle(),
        "skyline_join_priority": _grouped_sky_oracle(
            key="o_orderpriority",
            cols="o_orderpriority, l_orderkey, l_linenumber, l_extendedprice, l_quantity",
            from_sql="lineitem JOIN orders ON l_orderkey = o_orderkey",
        ),
        "skyline_5dim": _fast_sky_sql(
            "l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity, l_tax, l_shipdate",
            _DIMS5,
        ),
        "skyline_layers": _layers_oracle(),
        "skyline_events": """
SELECT event_id, ts, value
FROM events p
WHERE p.value IS NOT NULL AND p.ts IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM events q
    WHERE q.value IS NOT NULL AND q.ts IS NOT NULL
      AND q.value >= p.value AND q.ts <= p.ts
      AND (q.value > p.value OR q.ts < p.ts))
""",
        "skyline_gsod_9dim": _gsod_oracle(),
        "skyline_kband_events": """
SELECT event_id, ts, value FROM events p
WHERE p.value IS NOT NULL AND p.ts IS NOT NULL AND (
  SELECT count(*) FROM events q
  WHERE q.value IS NOT NULL AND q.ts IS NOT NULL
    AND q.value >= p.value AND q.ts <= p.ts
    AND (q.value > p.value OR q.ts < p.ts)) < 3
""",
        "profile_lineitem": """
SELECT 'l_quantity' AS dim, min(l_quantity) AS min_val, max(l_quantity) AS max_val,
       count(*) AS n_total, count(l_quantity) AS n_present FROM lineitem
UNION ALL
SELECT 'l_extendedprice', min(l_extendedprice), max(l_extendedprice), count(*), count(l_extendedprice) FROM lineitem
UNION ALL
SELECT 'l_discount', min(l_discount), max(l_discount), count(*), count(l_discount) FROM lineitem
UNION ALL
SELECT 'l_tax', min(l_tax), max(l_tax), count(*), count(l_tax) FROM lineitem
""",
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "join_nation_revenue": """
SELECT n_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "window_top2_orders": """
SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "text_stats_documents": f"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS n_distinct_tokens,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t IN {_STOPWORDS_SQL})) AS n_stopwords,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS fingerprint
FROM documents
""",
        "fingerprint_rolling_documents": """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           [('0x' || substr(md5(t), 1, 15))::BIGINT
            FOR t IN regexp_split_to_array(trim(text), '\\s+')]),
         (acc, h) -> (acc * 1000003 + h) % 2147483647
       ) AS roll_fp
FROM documents
""",
        "quality_flags_documents": f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), s -> s IN {_STOPWORDS_SQL})) AS n_stop,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(text) AS n_chars
  FROM documents)
SELECT doc_id, n_tok AS n_tokens,
       n_tok >= 10 AS len_ok,
       n_stop * 100 <= 50 * n_tok AS stopword_ok,
       n_punct * 100 <= 20 * n_chars AS punct_ok,
       (n_tok >= 10 AND n_stop * 100 <= 50 * n_tok AND n_punct * 100 <= 20 * n_chars) AS quality_ok
FROM t
""",
        "dedup_exact_documents": """
WITH g AS (
  SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
  FROM documents GROUP BY 1)
SELECT ('0x' || substr(h, 1, 15))::BIGINT AS fingerprint, keep_id, n_copies
FROM g
""",
        "dedup_minhash_documents": _JACCARD_PAIRS_SQL,
        # 4-wave availableNow replay of the same operator: the pair
        # set is order-independent and equals the batch twin's
        "streaming_near_dup_replay": _JACCARD_PAIRS_SQL,
        # brute-force max-Jaccard vs the perturbed eval set, scoped to
        # pairs at/above the 0.5 threshold (the deterministic contract)
        "decontaminate_fuzzy_documents": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
btoks AS (
  SELECT doc_id + 900000 AS doc_id,
         regexp_split_to_array(trim('zz ' || text), '\\s+') AS t
  FROM documents WHERE doc_id % 50 = 0
),
bsh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM btoks
),
scores AS (
  SELECT a.doc_id,
         max(CASE WHEN len(list_intersect(a.s, b.s))::DOUBLE
                       / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
                  THEN len(list_intersect(a.s, b.s))::DOUBLE
                       / len(list_distinct(list_concat(a.s, b.s))) END) AS mx
  FROM sh a, bsh b
  GROUP BY a.doc_id
)
SELECT t.doc_id,
       coalesce(s.mx, 0.0) AS max_eval_jaccard,
       s.mx IS NOT NULL AS contaminated
FROM toks t LEFT JOIN scores s USING (doc_id)
""",
        "segment_dedup_shifted": _SEGMENT_CDC_SQL,
        "repetition_stats_documents": _REPETITION_SQL,
        "redact_pii_documents": _REDACT_PII_SQL,
        "dedup_clusters_documents": _DEDUP_CLUSTERS_SQL,
        "dedup_star_clusters": _DEDUP_CLUSTERS_SQL,
        "jsonl_roundtrip_documents": (
            "SELECT doc_id, lang, n_chars, length(text)::BIGINT AS text_len FROM documents"
        ),
        "lang_id_documents": _lang_id_oracle(),
        "langid_confusion_documents": f"""
WITH pred AS ({_lang_id_oracle_indent()})
SELECT d.lang AS actual, p.lang_pred AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY actual, predicted
ORDER BY actual, predicted
""",
        "reverse_skyline_part": _reverse_skyline_oracle(),
        "ngram_jaccard_documents": _JACCARD_PAIRS_SQL,
        # prefix-filtered EXACT join shares the all-pairs brute-force
        # oracle: same contract, different (scalable) physical plan
        "setsim_join_documents": _JACCARD_PAIRS_SQL,
        "segment_dedup_documents": _SEGMENT_DEDUP_SQL,
        "heavy_hitters_tokens": _HEAVY_HITTERS_SQL,
        "classifier_score_documents": _CLASSIFIER_SQL,
        "histogram_orders": _HISTOGRAM_SQL,
        "stratified_topk_documents": """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT, text, doc_id
         ) AS rn
  FROM documents)
SELECT doc_id, source, n_chars FROM r WHERE rn <= 5
""",
        "equidepth_histogram_events": """
WITH d AS (SELECT value::DOUBLE AS x FROM events WHERE value IS NOT NULL),
b AS (
  SELECT quantile_cont(x, 0.125) AS b1, quantile_cont(x, 0.25) AS b2,
         quantile_cont(x, 0.375) AS b3, quantile_cont(x, 0.5) AS b4,
         quantile_cont(x, 0.625) AS b5, quantile_cont(x, 0.75) AS b6,
         quantile_cont(x, 0.875) AS b7
  FROM d)
SELECT (CASE WHEN x > b1 THEN 1 ELSE 0 END + CASE WHEN x > b2 THEN 1 ELSE 0 END
      + CASE WHEN x > b3 THEN 1 ELSE 0 END + CASE WHEN x > b4 THEN 1 ELSE 0 END
      + CASE WHEN x > b5 THEN 1 ELSE 0 END + CASE WHEN x > b6 THEN 1 ELSE 0 END
      + CASE WHEN x > b7 THEN 1 ELSE 0 END)::INT AS bucket,
       count(*)::BIGINT AS cnt, min(x) AS min_v, max(x) AS max_v
FROM d, b GROUP BY 1
""",
        "cohort_retention_users": """
WITH first AS (
  SELECT user_id, strftime(min(ts), '%Y-%m-%d') AS cohort FROM events GROUP BY 1
)
SELECT cohort,
       date_diff('day', cohort::DATE, ts::DATE)::INT AS day_offset,
       count(DISTINCT e.user_id)::BIGINT AS active_users
FROM events e JOIN first f USING (user_id)
GROUP BY 1, 2
""",
        "top_paths_users": """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 5 GROUP BY user_id)
SELECT path, count(*)::BIGINT AS n_users FROM paths GROUP BY path
""",
        "fuzzy_pairs_partnames": """
WITH names AS (SELECT DISTINCT p_name AS v FROM part WHERE p_name IS NOT NULL)
SELECT a.v AS a, b.v AS b, levenshtein(a.v, b.v) AS dist
FROM names a JOIN names b ON a.v < b.v
WHERE levenshtein(a.v, b.v) <= 1
""",
        "entity_resolution_partnames": """
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name AS v FROM part WHERE p_name IS NOT NULL
),
pairs AS (
  SELECT a.v AS a, b.v AS b
  FROM names a JOIN names b ON a.v < b.v
  WHERE levenshtein(a.v, b.v) <= 1
),
edges AS (
  SELECT a AS s, b AS d FROM pairs
  UNION
  SELECT b AS s, a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d
),
canon AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
SELECT n.v AS p_name, coalesce(c.canonical, n.v) AS canonical
FROM names n LEFT JOIN canon c ON n.v = c.id
""",
        "trailing_hour_events": """
SELECT user_id, ts, value,
       count(*) OVER w AS trailing_n,
       (sum(value::DECIMAL(20,4)) OVER w)::DOUBLE AS trailing_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "scd2_user_events": """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM chg
""",
        "gapfill_events_hourly": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         count(*)::BIGINT AS n, sum(value::DECIMAL(20,4)) AS sv
  FROM events GROUP BY 1, 2),
spans AS (SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx
          FROM hourly GROUP BY 1),
grid AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start
         FROM spans)
SELECT g.event_type, g.bucket_start,
       coalesce(h.n, 0)::BIGINT AS n_events,
       (last_value(h.sv IGNORE NULLS) OVER (
          PARTITION BY g.event_type ORDER BY g.bucket_start
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS sum_value_filled
FROM grid g LEFT JOIN hourly h USING (event_type, bucket_start)
""",
        "events_daily_rollup": """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*)::BIGINT AS n_events,
       sum(value::DECIMAL(20,4))::DOUBLE AS sum_value
FROM events GROUP BY 1, 2
""",
        "dedup_simhash_documents": _simhash_oracle(),
        "topk_similarity": """
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 6) AS score
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC, e.vec_id
LIMIT 10
""",
        # ann_lsh_topk / ann_ivf_topk raw outputs stay rows-only
        # (bucket membership is probabilistic on natural data), but the
        # planted-neighbor RECALL queries are deterministic: the oracle
        # derives the expected hits (= all 10 planted copies, cosine
        # 1.0 > max natural ~0.51) from the data; a single missed probe
        # on the Spark side breaks the hash
        "ann_recall_lsh": _ANN_RECALL_SQL,
        "ann_recall_ivf": _ANN_RECALL_SQL,
        # r13: the converted ann_*_topk entries (no longer rows-only)
        "ann_lsh_topk": _ANN_TOPK_SQL,
        "ann_ivf_topk": _ANN_TOPK_SQL,
        "approx_distinct_check": _APPROX_DISTINCT_CHECK_SQL,
        "approx_percentile_check": _APPROX_PCTL_CHECK_SQL,
        # iterative-loop known-answer twins: the cycle graph's rank is
        # analytically 1/n with single-addend sums (order-free); the
        # blob fixture's cluster sizes are exact by construction
        "pagerank_cycle_check": """
SELECT i AS id, round(1.0/100, 9) AS rank FROM range(100) t(i)
""",
        "streaming_enrich_replay": """
SELECT e.event_id, e.user_id, n.n_name
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
""",
        # same contract as the batch events_hourly query
        "streaming_rollup_replay": """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "encode_documents": """
WITH tk AS (
  SELECT doc_id,
         unnest(range(1, len(t)+1)) AS pos,
         unnest(t) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
),
vc AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
rk AS (
  SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS tid
  FROM vc QUALIFY tid <= 2000
)
SELECT tk.doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN rk.tid IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       string_agg(coalesce(rk.tid, 0)::VARCHAR, '-' ORDER BY tk.pos) AS token_ids
FROM tk LEFT JOIN rk USING (tok)
GROUP BY tk.doc_id
""",
        "data_quality_orders": """
WITH a AS (
  SELECT count(*) AS n,
         count(o_orderkey) - count(DISTINCT o_orderkey) AS dup,
         count(CASE WHEN o_custkey IS NULL THEN 1 END) AS nn,
         count(CASE WHEN o_totalprice IS NOT NULL
                     AND (o_totalprice < 0.0 OR o_totalprice > 600000.0) THEN 1 END) AS rng,
         count(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O','F','P') THEN 1 END) AS acc,
         count(CASE WHEN o_orderpriority IS NOT NULL
                     AND NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END) AS rex
  FROM orders)
SELECT 'min_rows(100)' AS rule, round(n::DOUBLE, 9) AS metric, n >= 100 AS ok FROM a
UNION ALL SELECT 'unique(o_orderkey)', round(dup::DOUBLE, 9), dup = 0 FROM a
UNION ALL SELECT 'not_null(o_custkey)', round(nn::DOUBLE / n, 9), nn::DOUBLE / n <= 0.0 FROM a
UNION ALL SELECT 'in_range(o_totalprice,0.0,600000.0)', round(rng::DOUBLE, 9), rng = 0 FROM a
UNION ALL SELECT 'accepted_values(o_orderstatus)', round(acc::DOUBLE, 9), acc = 0 FROM a
UNION ALL SELECT 'matches(o_orderpriority)', round(rex::DOUBLE, 9), rex = 0 FROM a
""",
        # expected kind/dims/sample-rate derived from doc_id: the Spark
        # side must synthesize valid format bytes and parse the SAME
        # numbers back out of them
        "image_header_check": """
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                       WHEN 2 THEN 'bmp' WHEN 3 THEN 'jpeg'
                       ELSE 'wav' END AS kind,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE (1 + doc_id % 64)::INTEGER END AS width,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE (1 + doc_id % 48)::INTEGER END AS height,
       CASE WHEN doc_id % 5 = 4 THEN ((1 + doc_id % 64) * 100)::INTEGER
            ELSE NULL END AS sample_rate
FROM documents
""",
        "kmeans_blobs_check": """
SELECT i::INTEGER AS cluster, CAST(25 AS BIGINT) AS n_members FROM range(4) t(i)
""",
        # gap-sessionization islands; session_end = last event + gap;
        # >= matches Spark's strict-interior merge rule
        "streaming_session_replay": """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       count(*)::BIGINT AS n_events
FROM g GROUP BY user_id, sid
""",
        "embedding_near_dup": """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 25
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS score
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.9
""",
        "semantic_dedup_embeddings": """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 25
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.9
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT ed.s, reach.r FROM edges ed JOIN reach ON reach.id = ed.d
),
labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT e.vec_id FROM e
WHERE e.vec_id NOT IN (SELECT id FROM labels WHERE id <> cluster_id)
""",
        "multimodal_stats": """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       upper(substr(hex(encode(text)), 1, 8)) AS header_hex,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
FROM documents
""",
        "set_ops_customers": """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
        "rollup_orders": """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
        "anti_join_customers": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
        "sessionize_events": """
SELECT user_id, event_id,
       CAST(sum(new_session) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events)
""",
        "distinct_users_by_type": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
""",
        "asof_join_events": """
SELECT c.user_id, c.event_id, c.ts,
       p.event_id AS event_id_right, p.ts AS ts_right
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
        "range_join_events": """
SELECT l.user_id, l.event_id, r.event_id AS event_id_after
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE epoch_us(r.ts) - epoch_us(l.ts) > 0
  AND epoch_us(r.ts) - epoch_us(l.ts) <= 300 * 1000000
""",
        "q3_shipping_priority": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          - sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""",
        "q6_forecast_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
        "q17_small_qty_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l.l_quantity < (
    SELECT 0.2 * avg(q.l_quantity) FROM lineitem q WHERE q.l_partkey = l.l_partkey)
""",
        "q18_large_orders": """
SELECT c_name, o_orderkey, o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
        "q5_local_supplier": """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          - sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
        "q10_returned_items": """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          - sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
""",
        "q4_priority_exists": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
        "q7_volume_shipping": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          - sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
        "q12_priority_by_linestatus": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
""",
        "q14_promo_revenue": """
WITH t AS (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(12,2))
           - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01')
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(19,6)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE) AS promo_revenue_pct
FROM t
""",
        "q16_supplier_cnt": """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size BETWEEN 10 AND 30
GROUP BY p_brand, p_type
""",
        "q19_disjunctive_revenue": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          - sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))
         AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#33' AND p_size <= 35 AND l_quantity BETWEEN 20 AND 40)
""",
        "q22_sales_opportunity": """
WITH pos AS (
  SELECT count(*) AS n, sum(CAST(c_acctbal AS DECIMAL(12,2))) AS tot
  FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN pos
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * pos.n > pos.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n_name
""",
        "q8_market_share": """
WITH t AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN nation n2 ON s_nationkey = n2.n_nationkey)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE CAST(0 AS DECIMAL(19,6)) END) AS DOUBLE)
         / CAST(sum(vol) AS DOUBLE) AS mkt_share
FROM t GROUP BY o_year
""",
        "q9_profit_by_nation": """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
""",
        "q11_important_brands": """
WITH bv AS (
  SELECT p_brand, sum(CAST(l_extendedprice AS DECIMAL(12,2))
         - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS val
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand),
tot AS (SELECT sum(val) AS total FROM bv)
SELECT p_brand, CAST(val AS DOUBLE) AS brand_value
FROM bv CROSS JOIN tot
WHERE CAST(val AS DOUBLE) * 25.0 > CAST(total AS DOUBLE)
""",
        "q13_customer_distribution": """
WITH pc AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM pc GROUP BY c_count
""",
        "q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))
        - CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey),
mx AS (SELECT max(r) AS mr FROM rev)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev CROSS JOIN mx JOIN supplier ON l_suppkey = s_suppkey
WHERE r = mr
""",
        "chunk_documents": """
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
ch AS (SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), 48)) AS s FROM tok)
SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_id,
       array_to_string(t[s+1:s+64], ' ') AS chunk_text,
       CAST(len(regexp_split_to_array(array_to_string(t[s+1:s+64], ' '), '\\s+')) AS INTEGER) AS n_chunk_tokens
FROM ch
""",
        "token_entropy_documents": """
WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_token_types,
               list_sort(list(c)) AS cs
        FROM cnt GROUP BY doc_id)
SELECT doc_id, n AS n_tokens, n_token_types,
       round(log2(CAST(n AS DOUBLE))
         - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                    [CAST(x AS DOUBLE) * log2(CAST(x AS DOUBLE)) FOR x IN cs]),
                       (a, b) -> a + b) / CAST(n AS DOUBLE), 6) AS token_entropy
FROM agg
""",
        "mix_corpus_sources": """
WITH w(source, wt) AS (VALUES ('src0', 4), ('src1', 3), ('src2', 2), ('src3', 2), ('src4', 1)),
cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
j AS (SELECT c.source, n, wt FROM cnt c JOIN w USING (source)),
m AS (SELECT n AS nm, wt AS wm FROM j ORDER BY CAST(n AS DOUBLE)/wt, n, wt LIMIT 1),
thr AS (SELECT source, (1000000 * nm * wt) // (wm * n) AS t FROM j CROSS JOIN m)
SELECT d.doc_id, d.source
FROM documents d JOIN thr ON d.source = thr.source
WHERE ('0x' || substr(md5(d.text), 1, 15))::BIGINT % 1000000 < t
""",
        "decontaminate_documents": """
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
g AS (SELECT doc_id, CASE WHEN len(t) >= 5
          THEN list_distinct([array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)])
          ELSE CAST([] AS VARCHAR[]) END AS gs
      FROM tok),
bench AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 10 = 0),
ev AS (SELECT doc_id, gs FROM g WHERE doc_id % 10 <> 0),
sh AS (SELECT doc_id, count(*) AS n_shared
       FROM (SELECT doc_id, unnest(gs) AS gr FROM ev) e JOIN bench USING (gr)
       GROUP BY doc_id)
SELECT ev.doc_id, CAST(len(gs) AS INTEGER) AS n_grams,
       coalesce(n_shared, 0) AS n_shared,
       CAST(coalesce(n_shared, 0) AS DOUBLE) / greatest(CAST(len(gs) AS INTEGER), 1) AS contamination
FROM ev LEFT JOIN sh USING (doc_id)
""",
        "topk_batch_similarity": """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.qid, e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid),
ranked AS (SELECT qid, vec_id, s,
                  row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
           FROM scored)
SELECT qid, vec_id, round(s, 6) AS score FROM ranked WHERE rn <= 10
""",
        "streaming_skyline_replay": """
WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS value,
                  CAST(epoch_us(ts) AS DOUBLE) AS ts_us
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL)
SELECT p.event_type, p.value, p.ts_us FROM e p
WHERE NOT EXISTS (
  SELECT 1 FROM e t WHERE t.event_type = p.event_type
    AND t.value >= p.value AND t.ts_us <= p.ts_us
    AND (t.value > p.value OR t.ts_us < p.ts_us))
""",
        "streaming_interval_join_replay": """
SELECT l.user_id, l.event_id, r.event_id AS event_id_after
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE epoch_us(r.ts) - epoch_us(l.ts) > 0
  AND epoch_us(r.ts) - epoch_us(l.ts) <= 300 * 1000000
""",
        "streaming_dedup_replay": """
SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS fingerprint
FROM (SELECT doc_id, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn = 1
""",
        "q2_min_cost_supplier": """
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer
  FROM lineitem GROUP BY 1, 2),
sn AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       FROM supplier, nation, region
       WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'),
ro AS (SELECT o.l_partkey, o.offer, sn.s_name, sn.s_acctbal, sn.n_name
       FROM offers o JOIN sn ON o.l_suppkey = sn.s_suppkey)
SELECT ro.s_acctbal, ro.s_name, ro.n_name, p.p_partkey, p.p_brand
FROM ro JOIN part p ON ro.l_partkey = p.p_partkey
WHERE p.p_size = 5 AND p.p_type = 'ECONOMY'
  AND ro.offer = (SELECT min(ro2.offer) FROM ro ro2
                  WHERE ro2.l_partkey = ro.l_partkey)
""",
        "q21_waiting_orders": """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
        "q20_excess_suppliers": """
SELECT s_suppkey, s_name FROM supplier, nation
WHERE s_nationkey = n_nationkey AND n_name = 'NATION_9'
  AND s_suppkey IN (
    SELECT sp.l_suppkey FROM (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty95
      FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1, 2) sp
    WHERE sp.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND sp.qty95 > 0.3 * (SELECT sum(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = sp.l_partkey
                              AND l2.l_suppkey = sp.l_suppkey))
""",
        "knn_graph_sample": """
WITH scored AS (
  SELECT q.vec_id AS qid, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS s
  FROM embeddings e CROSS JOIN embeddings q
  WHERE e.vec_id <> q.vec_id),
ranked AS (SELECT qid, vec_id, s,
                  row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
           FROM scored)
SELECT qid, vec_id, round(s, 6) AS score FROM ranked WHERE rn <= 5
""",
        "dynamic_skyline_part": """
SELECT p.p_partkey, p.p_retailprice, p.p_size FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part t
  WHERE abs(t.p_retailprice - 960.0) <= abs(p.p_retailprice - 960.0)
    AND abs(t.p_size - 20) <= abs(p.p_size - 20)
    AND (abs(t.p_retailprice - 960.0) < abs(p.p_retailprice - 960.0)
      OR abs(t.p_size - 20) < abs(p.p_size - 20)))
""",
        "pack_sequences_documents": """
WITH base AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 15))::BIGINT % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, shard, n_tokens,
       shard * 1099511627776 + (CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens) // 512 AS pack_id
FROM base
WINDOW w AS (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        "unigram_logprob_documents": """
WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents),
dc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
gc AS (SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM dc GROUP BY tok),
tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gc),
terms AS (SELECT doc_id, c, CAST(c AS DOUBLE) * log2(CAST(g AS DOUBLE)) AS term
          FROM dc JOIN gc USING (tok)),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, list_sort(list(term)) AS ts
        FROM terms GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), ts), (a, b) -> a + b)
         / CAST(n_tokens AS DOUBLE)
         - log2((SELECT CAST(n AS DOUBLE) FROM tot)), 6) AS avg_token_logprob
FROM agg
""",
        "bigram_logprob_documents": """
WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, greatest(len(t), 1))]) AS b
  FROM toks
),
dc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
gb AS (SELECT b, CAST(sum(c) AS BIGINT) AS c12 FROM dc GROUP BY b),
ctx AS (SELECT split_part(b, ' ', 1) AS w1, CAST(sum(c12) AS BIGINT) AS c1 FROM gb GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS vv FROM (SELECT unnest(t) AS tok FROM toks)),
terms AS (
  SELECT dc.doc_id, dc.c,
         CAST(dc.c AS DOUBLE)
           * (log2(CAST(gb.c12 + 1 AS DOUBLE)) - log2(CAST(ctx.c1 + v.vv AS DOUBLE))) AS term
  FROM dc JOIN gb USING (b)
  JOIN ctx ON split_part(dc.b, ' ', 1) = ctx.w1, v
),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, list_sort(list(term)) AS ts
        FROM terms GROUP BY doc_id)
SELECT doc_id, n_bigrams,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), ts), (a, b) -> a + b)
         / CAST(n_bigrams AS DOUBLE), 6) AS avg_bigram_logprob
FROM agg
""",
        "window_analytics_events": """
SELECT user_id, event_id, event_type, value,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       CAST(sum(CAST(value AS DECIMAL(12,2)))
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       CAST(row_number() OVER w AS INTEGER) AS event_seq,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       coalesce(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w), -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        "window_analytics_orders": """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       CAST(row_number() OVER w AS INTEGER) AS order_seq,
       CAST(ntile(4) OVER w AS INTEGER) AS spend_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "sample_documents_hash": """
SELECT doc_id, n_chars FROM documents
WHERE ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000 < 200000
""",
        "reservoir_documents": """
SELECT doc_id FROM documents
ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT, text
LIMIT 50
""",
        "hash_split_documents": """
WITH t AS (
  SELECT CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 80 THEN 'train'
              WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents)
SELECT split, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens
FROM t GROUP BY split
""",
        "term_doc_freq_topk": """
SELECT t AS token, count(*) AS doc_freq
FROM (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
      FROM documents)
GROUP BY t ORDER BY doc_freq DESC, t LIMIT 20
""",
        "funnel_users": """
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS t_view,
         min(ts) FILTER (WHERE event_type = 'click') AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM firsts
""",
        "ngram_dup_stats_documents": """
WITH sh AS (
  SELECT doc_id,
         [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          FOR i IN range(1, greatest(len(t)-1, 1))] AS grams
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents))
SELECT doc_id, len(grams) AS n_3grams,
       len(list_distinct(grams)) AS n_distinct_3grams
FROM sh
""",
        "semi_join_customers": """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
        "pivot_user_events": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
""",
        "above_avg_orders": """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT CAST(count(*) AS DECIMAL(10,0)) FROM orders)
      > (SELECT sum(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders)
""",
        # whitespace via the pinned explicit class (doubled '' = SQL
        # apostrophe escape), mirroring _BPE_PATTERN exactly
        "token_bpe_documents": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\x0B\f\r'']+|[ \t\n\x0B\f\r]+')) AS INTEGER) AS n_bpe_tokens
FROM documents
""",
        "percentile_value_by_type": """
SELECT event_type, quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90
FROM events GROUP BY event_type
""",
        "cube_events": """
SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day, count(*) AS n_events
FROM events GROUP BY CUBE (event_type, hour(ts))
""",
        "explode_tokens_topk": """
SELECT t AS token, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents)
GROUP BY t ORDER BY n DESC, t LIMIT 20
""",
        # head_upper: pinned ASCII-only case law (TX.ascii_upper_sql);
        # head_rev: pinned CODEPOINT reverse — DuckDB's reverse() is
        # grapheme-aware (keeps combining sequences/ZWJ/flags intact)
        # while Spark's reverses codepoints, so the oracle splits to
        # codepoints first ('(?s).' = any char including newline)
        "string_funcs_documents": f"""
SELECT doc_id,
       {TX.ascii_upper_sql("substr(text, 1, 20)")} AS head_upper,
       array_to_string(list_reverse(regexp_extract_all(substr(text, 1, 20), '(?s).')), '') AS head_rev,
       CAST(levenshtein(substr(text, 1, 20), 'the quick brown fox') AS INTEGER) AS lev_dist
FROM documents
""",
        # approx_distinct_users: HLL sketch, approximate by design -> rows-only
        'boilerplate_documents': """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 700000,
         'subscribe to our newsletter click here for more ' || text
  FROM documents WHERE doc_id % 10 = 0
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
  WHERE text IS NOT NULL AND trim(text) <> ''
),
segs AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(t[(i-1)*8+1 : i*8], ' ')
                 FOR i IN range(1, greatest((len(t)+7)//8, 1)+1)]) AS segment
  FROM toks
)
SELECT segment, count(*) AS doc_freq, min(doc_id) AS first_doc
FROM segs GROUP BY segment HAVING count(*) >= 3 ORDER BY segment
""",
        'strip_boilerplate_documents': """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 700000,
         'subscribe to our newsletter click here for more ' || text
  FROM documents WHERE doc_id % 10 = 0
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM base
  WHERE text IS NOT NULL AND trim(text) <> ''
),
segs AS (
  SELECT doc_id,
         unnest(range(1, greatest((len(t)+7)//8, 1)+1)) AS pos,
         unnest([array_to_string(t[(i-1)*8+1 : i*8], ' ')
                 FOR i IN range(1, greatest((len(t)+7)//8, 1)+1)]) AS seg
  FROM toks
),
flagged AS (
  SELECT seg FROM (
    SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
  ) WHERE df >= 3
),
marked AS (
  SELECT s.doc_id, s.pos, s.seg, f.seg IS NOT NULL AS flag
  FROM segs s LEFT JOIN flagged f USING (seg)
),
rebuilt AS (
  SELECT doc_id,
         count(*) AS n_segments,
         -- CAST: HUGEINT sum reaches pandas as float64 (driver-red
         -- value-hash class; tools/dtype_audit.py)
         CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         md5(coalesce(
           array_to_string(list(seg ORDER BY pos) FILTER (WHERE NOT flag), ' '),
           '')) AS clean_md5
  FROM marked GROUP BY doc_id
)
SELECT doc_id, n_segments, n_flagged, clean_md5
FROM rebuilt WHERE n_flagged > 0 ORDER BY doc_id
""",
        'gini_orders': """
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
pv AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS c FROM o GROUP BY g, v),
cw AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM pv
),
ag AS (
  SELECT g,
         sum(CAST(v AS HUGEINT) * (cc*(cc+1) - (cc-c)*(cc-c+1))) AS tr,
         sum(CAST(v AS HUGEINT) * c) AS total,
         sum(c) AS n
  FROM cw GROUP BY g
)
SELECT g AS o_orderpriority,
       CAST(n AS BIGINT) AS n_rows,
       CAST(total AS BIGINT) AS total,
       CASE WHEN total > 0 THEN
         round(CAST(tr - (n+1)*total AS DOUBLE) / CAST(n*total AS DOUBLE), 9)
       END AS gini
FROM ag ORDER BY o_orderpriority
""",
        'ewma_orders': """
WITH m AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2
),
e AS (
  SELECT o_orderpriority, month, revenue_cents,
         coalesce(CAST((revenue_cents) AS HUGEINT), 0) * 100000000000
           + coalesce(CAST((lag(revenue_cents, 1) OVER w) AS HUGEINT), 0) * 70000000000
           + coalesce(CAST((lag(revenue_cents, 2) OVER w) AS HUGEINT), 0) * 49000000000
           + coalesce(CAST((lag(revenue_cents, 3) OVER w) AS HUGEINT), 0) * 34300000000
           + coalesce(CAST((lag(revenue_cents, 4) OVER w) AS HUGEINT), 0) * 24010000000
           + coalesce(CAST((lag(revenue_cents, 5) OVER w) AS HUGEINT), 0) * 16807000000
           + coalesce(CAST((lag(revenue_cents, 6) OVER w) AS HUGEINT), 0) * 11764900000
           + coalesce(CAST((lag(revenue_cents, 7) OVER w) AS HUGEINT), 0) * 8235430000
           + coalesce(CAST((lag(revenue_cents, 8) OVER w) AS HUGEINT), 0) * 5764801000
           + coalesce(CAST((lag(revenue_cents, 9) OVER w) AS HUGEINT), 0) * 4035360700
           + coalesce(CAST((lag(revenue_cents, 10) OVER w) AS HUGEINT), 0) * 2824752490
           + coalesce(CAST((lag(revenue_cents, 11) OVER w) AS HUGEINT), 0) * 1977326743 AS nm,
         CASE WHEN (revenue_cents) IS NOT NULL THEN CAST(100000000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 1) OVER w) IS NOT NULL THEN CAST(70000000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 2) OVER w) IS NOT NULL THEN CAST(49000000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 3) OVER w) IS NOT NULL THEN CAST(34300000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 4) OVER w) IS NOT NULL THEN CAST(24010000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 5) OVER w) IS NOT NULL THEN CAST(16807000000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 6) OVER w) IS NOT NULL THEN CAST(11764900000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 7) OVER w) IS NOT NULL THEN CAST(8235430000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 8) OVER w) IS NOT NULL THEN CAST(5764801000 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 9) OVER w) IS NOT NULL THEN CAST(4035360700 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 10) OVER w) IS NOT NULL THEN CAST(2824752490 AS HUGEINT) ELSE 0 END
           + CASE WHEN (lag(revenue_cents, 11) OVER w) IS NOT NULL THEN CAST(1977326743 AS HUGEINT) ELSE 0 END AS dn
  FROM m
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
)
-- engine-exact HALF-UP: rounded scaled integer via exact HUGEINT
-- floor-division, then ONE float step on the identical integer
-- (the _rounding.exact_round_div twin; double-round ties diverge
-- across engines, caught by the r11 sf0.1 sweep)
SELECT o_orderpriority, month, revenue_cents,
       (CASE WHEN nm < 0 THEN -1 ELSE 1 END)
         * CAST((2 * abs(nm) * 10000 + dn) // (2 * dn) AS DOUBLE)
         / 10000.0 AS ewma
FROM e
ORDER BY o_orderpriority, month
""",
        'auc_purchase_events': """
WITH e AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
ps AS (
  SELECT s, CAST(sum(lab) AS HUGEINT) AS p,
         CAST(count(*) - sum(lab) AS HUGEINT) AS n
  FROM e GROUP BY s
),
c AS (
  SELECT s, p, n,
         sum(n) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS below
  FROM ps
)
SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(n) AS BIGINT) AS n_neg,
       CAST(count(*) AS BIGINT) AS n_scores,
       CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
         round(CAST(sum(p * (2*below + n)) AS DOUBLE)
               / CAST(2 * sum(p) * sum(n) AS DOUBLE), 9)
       END AS auc
FROM c
""",
        'chi2_events': """
WITH e AS (
  SELECT event_type AS a, dayofweek(ts) + 1 AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS o FROM e GROUP BY a, b),
ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY b),
nn AS (SELECT sum(o) AS nn FROM cells)
SELECT cells.a AS event_type, CAST(cells.b AS INTEGER) AS dow,
       CAST(cells.o AS BIGINT) AS observed,
       round(CAST(ra.ra * cb.cb AS DOUBLE) / CAST(nn.nn AS DOUBLE), 9)
         AS expected,
       round(CAST((nn.nn*cells.o - ra.ra*cb.cb)
                  * (nn.nn*cells.o - ra.ra*cb.cb) AS DOUBLE)
             / CAST(nn.nn * ra.ra * cb.cb AS DOUBLE), 9) AS contrib
FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn
ORDER BY event_type, dow
""",
        'survival_km_users': """
WITH ev AS (
  SELECT user_id, event_id, ts, event_type, CAST(ts AS DATE) AS d FROM events
),
fe AS (
  SELECT user_id, event_type AS cohort, d AS first_d,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM ev
),
firsts AS (SELECT user_id, cohort, first_d FROM fe WHERE rn = 1),
per_u AS (
  SELECT user_id, max(d) AS last_d,
         min(CASE WHEN event_type = 'purchase' THEN d END) AS purchase_d
  FROM ev GROUP BY user_id
),
subj AS (
  SELECT f.cohort,
         date_diff('day', f.first_d, coalesce(p.purchase_d, p.last_d))
           AS duration,
         CASE WHEN p.purchase_d IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM firsts f JOIN per_u p USING (user_id)
),
per_t AS (
  SELECT cohort, duration AS t, sum(event) AS d,
         count(*) - sum(event) AS c
  FROM subj GROUP BY cohort, duration
),
st AS (
  SELECT cohort, t, d, c,
         sum(d + c) OVER (PARTITION BY cohort)
         - sum(d + c) OVER (PARTITION BY cohort ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + d + c AS n
  FROM per_t
),
lg AS (
  SELECT cohort, t, d, c, n,
         sum(CASE WHEN d > 0 AND n > d THEN
               CAST(round(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                    AS DECIMAL(38,12))
             ELSE CAST(0 AS DECIMAL(38,12)) END)
           OVER (PARTITION BY cohort ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS slog,
         max(CASE WHEN d >= n THEN 1 ELSE 0 END)
           OVER (PARTITION BY cohort ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
  FROM st
)
SELECT cohort, CAST(t AS BIGINT) AS t, CAST(n AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
       CASE WHEN z = 1 THEN 0.0
            ELSE round(exp(CAST(slog AS DOUBLE)), 6) END AS survival
FROM lg WHERE d > 0 ORDER BY cohort, t
""",
        'benford_orders': """
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
d AS (
  SELECT substr(CAST(v AS VARCHAR), 1, 1) AS digit, count(*) AS observed
  FROM o WHERE v > 0 GROUP BY 1
),
t AS (SELECT sum(observed) AS n FROM d)
SELECT d.digit, d.observed,
       round(CAST(d.observed AS DOUBLE) / CAST(t.n AS DOUBLE), 9) AS frequency,
       CASE d.digit WHEN '1' THEN 0.301029996 WHEN '2' THEN 0.176091259 WHEN '3' THEN 0.124938737 WHEN '4' THEN 0.096910013 WHEN '5' THEN 0.079181246 WHEN '6' THEN 0.06694679 WHEN '7' THEN 0.057991947 WHEN '8' THEN 0.051152522 WHEN '9' THEN 0.045757491 END AS benford_expected,
       round(round(CAST(d.observed AS DOUBLE) / CAST(t.n AS DOUBLE), 9)
             - CASE d.digit WHEN '1' THEN 0.301029996 WHEN '2' THEN 0.176091259 WHEN '3' THEN 0.124938737 WHEN '4' THEN 0.096910013 WHEN '5' THEN 0.079181246 WHEN '6' THEN 0.06694679 WHEN '7' THEN 0.057991947 WHEN '8' THEN 0.051152522 WHEN '9' THEN 0.045757491 END, 9) AS deviation
FROM d CROSS JOIN t ORDER BY d.digit
""",
        'trimmed_mean_orders': """
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
pv AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS c FROM o GROUP BY g, v),
cw AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM pv
),
kk AS (SELECT *, (n * 1) // 20 AS k FROM cw),
kept AS (
  SELECT g, n, k, v,
         greatest(least(cum, n - k) - greatest(cum - c, k), 0) AS kc
  FROM kk
),
ag AS (
  SELECT g, max(n) AS n, max(k) AS k,
         sum(kc * CAST(v AS HUGEINT)) AS s, sum(kc) AS kept
  FROM kept GROUP BY g
)
SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_trimmed_each_side,
       CASE WHEN kept > 0 THEN
         round(CAST(s AS DOUBLE) / CAST(kept * 100 AS DOUBLE), 6)
       END AS trimmed_mean
FROM ag ORDER BY o_orderpriority
""",
        'position_attribution_events': """
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
  FROM events
),
convs AS (
  SELECT user_id, j, event_id AS conversion_event_id
  FROM seq WHERE event_type = 'purchase'
),
tch AS (
  SELECT user_id, j, event_id AS touch_event_id, event_type AS touch_type,
         row_number() OVER (PARTITION BY user_id, j ORDER BY ts, event_id)
           AS position,
         count(*) OVER (PARTITION BY user_id, j) AS n_touches
  FROM seq WHERE event_type IN ('click', 'view')
)
SELECT t.user_id, c.conversion_event_id, t.touch_event_id, t.touch_type,
       CAST(t.position AS INTEGER) AS position,
       CAST(t.n_touches AS BIGINT) AS n_touches,
       round(
         CAST(CASE WHEN t.n_touches = 1 THEN 1 WHEN t.n_touches = 2 THEN 1
                   WHEN t.position = 1 OR t.position = t.n_touches THEN 2
                   ELSE 1 END AS DOUBLE)
         / CAST(CASE WHEN t.n_touches = 1 THEN 1 WHEN t.n_touches = 2 THEN 2
                     WHEN t.position = 1 OR t.position = t.n_touches THEN 5
                     ELSE 5 * (t.n_touches - 2) END AS DOUBLE), 9) AS credit
FROM tch t JOIN convs c USING (user_id, j)
ORDER BY conversion_event_id, position
""",
        'mix_diversity_documents': """
WITH pu AS (
  SELECT lang, source, count(*) AS n FROM documents
  WHERE source IS NOT NULL GROUP BY 1, 2
),
ag AS (
  SELECT lang, sum(n) AS nn, count(*) AS k,
         sum(CAST(round(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)), 6)
                  AS DECIMAL(38,6))) AS slog,
         sum(CAST(n AS HUGEINT) * (n - 1)) AS pairs
  FROM pu GROUP BY lang
)
SELECT lang, CAST(nn AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_units,
       round(ln(CAST(nn AS DOUBLE)) - CAST(slog AS DOUBLE) / CAST(nn AS DOUBLE),
             6) AS shannon_h,
       round(exp(round(ln(CAST(nn AS DOUBLE))
                       - CAST(slog AS DOUBLE) / CAST(nn AS DOUBLE), 6)), 6)
         AS effective_units,
       CASE WHEN nn > 1 THEN
         round(1.0 - CAST(pairs AS DOUBLE)
               / CAST(CAST(nn AS HUGEINT) * (nn - 1) AS DOUBLE), 9)
       ELSE 0.0 END AS simpson
FROM ag ORDER BY lang
""",
        'pca_invariant_check': """
WITH u AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding)::DOUBLE * 1000000) AS HUGEINT) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
per AS (SELECT i, count(*) AS n, sum(v) AS s, sum(v*v) AS p FROM u GROUP BY i),
diag AS (
  SELECT i,
         round(CAST(n*p - s*s AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * 1000000.0 * 1000000.0), 9) AS cov
  FROM per
)
SELECT CAST(count(*) AS INTEGER) AS dim,
       round(CAST(sum(CAST(cov AS DECIMAL(38,9))) AS DOUBLE), 6) AS trace_var,
       round(CAST(sum(CAST(cov AS DECIMAL(38,9))) AS DOUBLE), 6) AS eig_sum
FROM diag
""",
        'l_diversity_customers': """
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
  FROM customer
),
pv AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS cnt
  FROM c GROUP BY 1, 2, 3
),
cls AS (
  SELECT c_nationkey, c_mktsegment, sum(cnt) AS class_size,
         count(*) AS n_sensitive
  FROM pv GROUP BY 1, 2
)
SELECT CAST(class_size AS BIGINT) AS class_size,
       CAST(n_sensitive AS BIGINT) AS n_sensitive,
       count(*) AS n_classes,
       CAST(class_size * count(*) AS BIGINT) AS n_rows,
       n_sensitive < 3 AS at_risk
FROM cls GROUP BY class_size, n_sensitive
ORDER BY class_size, n_sensitive
""",
        'ntile_buckets_lineitem': """
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS q
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
pv AS (SELECT q, count(*) AS c FROM v GROUP BY q),
cw AS (
  SELECT q, c,
         sum(c) OVER (ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
           AS n_smaller,
         sum(c) OVER () AS n
  FROM pv
)
SELECT CAST((n_smaller * 10) // n AS INTEGER) AS bin,
       CAST(sum(c) AS BIGINT) AS n_rows,
       min(q) AS min_value_q, max(q) AS max_value_q
FROM cw GROUP BY 1 ORDER BY bin
""",
        'calibration_documents': """
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
w AS (
  SELECT doc_id,
         ((('0x' || substr(md5(tok), 1, 15))::BIGINT % 10007) * 2654435761)
           % 10007 - 5003 AS wt
  FROM tk
),
agg AS (
  SELECT doc_id, sum(wt)::BIGINT AS sw, count(*)::BIGINT AS n_tokens
  FROM w GROUP BY doc_id
),
scored AS (
  SELECT agg.doc_id,
         round(1.0 / (1.0 + exp(-(sw::DOUBLE / (n_tokens::DOUBLE * 5003.0)))),
               6) AS prob,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_en
  FROM agg JOIN documents d ON agg.doc_id = d.doc_id
),
b AS (
  SELECT least(CAST(floor(prob * 10) AS INTEGER), 9) AS bin,
         count(*) AS n, sum(is_en) AS n_pos,
         sum(CAST(prob AS DECIMAL(38,6))) AS sp
  FROM scored GROUP BY 1
)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_prob,
       round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS observed_rate,
       round(round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9)
             - round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 9), 9) AS gap
FROM b ORDER BY bin
""",
        'vocab_budget_documents': """
WITH tk AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
c AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
r AS (
  SELECT tok, c,
         sum(c) OVER (ORDER BY c DESC, tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         row_number() OVER (ORDER BY c DESC, tok) AS rank,
         sum(c) OVER () AS total
  FROM c
),
t(num, den) AS (VALUES (50, 100), (90, 100), (95, 100), (99, 100))
SELECT t.num AS target_num, t.den AS target_den,
       min(r.rank) AS vocab_size,
       CAST(min_by(r.cum, r.rank) AS BIGINT) AS covered_tokens,
       CAST(max(r.total) AS BIGINT) AS total_tokens
FROM t JOIN r ON r.cum * t.den >= t.num * r.total
GROUP BY t.num, t.den ORDER BY target_num
""",
        'balanced_shards_documents': """
WITH r AS (
  SELECT n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents WHERE n_chars IS NOT NULL
),
s AS (
  SELECT CAST((rn - 1) % 8 AS INTEGER) AS shard, count(*) AS n_rows,
         sum(n_chars) AS tot, max(n_chars) AS max_size
  FROM r GROUP BY 1
),
g AS (SELECT sum(tot) AS gg FROM s)
SELECT shard, n_rows, CAST(tot AS BIGINT) AS total_size,
       CAST(max_size AS BIGINT) AS max_size,
       round(CAST(tot AS DOUBLE) * 8.0 / CAST(gg AS DOUBLE), 9) AS balance
FROM s CROSS JOIN g ORDER BY shard
""",
        'normalize_nfc_documents': """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 800000,
         text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber'
  FROM documents WHERE doc_id % 25 = 0
)
SELECT doc_id, md5(nfc_normalize(text)) AS clean_md5
FROM base WHERE nfc_normalize(text) <> text
ORDER BY doc_id
""",
        'referential_integrity_check': """
WITH li AS (
  SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem
  UNION ALL SELECT * FROM (VALUES (-1), (-1), (-2), (NULL)) v(k)
),
r1 AS (
  SELECT 'lineitem->orders' AS relation,
         (SELECT count(*) FROM li) AS n_child,
         (SELECT count(*) FROM li WHERE k IS NULL) AS n_null_keys,
         (SELECT count(*) FROM li WHERE k IS NOT NULL
            AND k NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans,
         (SELECT count(DISTINCT k) FROM li WHERE k IS NOT NULL
            AND k NOT IN (SELECT o_orderkey FROM orders))
           AS n_distinct_orphan_keys
),
r2 AS (
  SELECT 'orders->customer', count(*),
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN o_custkey IS NOT NULL
                   AND o_custkey NOT IN (SELECT c_custkey FROM customer)
             THEN 1 ELSE 0 END),
         count(DISTINCT CASE WHEN o_custkey IS NOT NULL
                   AND o_custkey NOT IN (SELECT c_custkey FROM customer)
               THEN o_custkey END)
  FROM orders
),
r3 AS (
  SELECT 'customer->nation', count(*),
         sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END),
         sum(CASE WHEN c_nationkey IS NOT NULL
                   AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
             THEN 1 ELSE 0 END),
         count(DISTINCT CASE WHEN c_nationkey IS NOT NULL
                   AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
               THEN c_nationkey END)
  FROM customer
)
SELECT relation, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_null_keys AS BIGINT) AS n_null_keys,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_distinct_orphan_keys AS BIGINT) AS n_distinct_orphan_keys
FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
ORDER BY relation
""",
        'ks_test_events': """
WITH t AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
),
pv AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM t GROUP BY v),
c AS (
  SELECT v, ca, cb,
         sum(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cuma,
         sum(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumb,
         sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM pv
)
SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS ks_num,
       CASE WHEN max(na) > 0 AND max(nb) > 0 THEN
         round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
               / CAST(max(na) * max(nb) AS DOUBLE), 9)
       END AS ks
FROM c
""",
        'mi_scan_events': """
WITH ev AS (
  SELECT event_type,
         CAST(dayofweek(ts) + 1 AS VARCHAR) AS dow,
         CAST(user_id % 10 AS VARCHAR) AS user_mod,
         CAST(CAST(floor(value / 20) AS BIGINT) AS VARCHAR) AS value_band
  FROM events
),
m AS (
  SELECT event_type AS y, 'dow' AS f, dow AS v FROM ev WHERE event_type IS NOT NULL AND dow IS NOT NULL
  UNION ALL
  SELECT event_type, 'user_mod', user_mod FROM ev WHERE event_type IS NOT NULL AND user_mod IS NOT NULL
  UNION ALL
  SELECT event_type, 'value_band', value_band FROM ev WHERE event_type IS NOT NULL AND value_band IS NOT NULL
),
cells AS (SELECT f, v, y, CAST(count(*) AS BIGINT) AS cxy FROM m GROUP BY 1, 2, 3),
ca AS (SELECT f, v, CAST(sum(cxy) AS BIGINT) AS c1 FROM cells GROUP BY 1, 2),
cb AS (SELECT f, y, CAST(sum(cxy) AS BIGINT) AS c2 FROM cells GROUP BY 1, 2),
tot AS (SELECT f, CAST(sum(cxy) AS BIGINT) AS n, count(*) AS n_cells FROM cells GROUP BY 1),
terms AS (
  SELECT cells.f, n, n_cells,
         CAST(cxy AS DOUBLE) * (log2(CAST(cxy AS DOUBLE))
                                + log2(CAST(n AS DOUBLE))
                                - log2(CAST(c1 AS DOUBLE))
                                - log2(CAST(c2 AS DOUBLE))) AS term
  FROM cells JOIN ca USING (f, v) JOIN cb USING (f, y) JOIN tot USING (f)
)
SELECT f AS feature, n AS n_rows, n_cells,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(term))),
                         (x, y) -> x + y) / CAST(n AS DOUBLE), 6) AS mi_bits
FROM terms GROUP BY f, n, n_cells
ORDER BY mi_bits DESC, feature
""",
        "image_dhash_check": """
WITH d AS (
  SELECT doc_id AS id, doc_id AS k, 'g' AS fam FROM documents
  UNION ALL
  SELECT doc_id + 900000, doc_id, 'g' FROM documents
  UNION ALL
  SELECT doc_id + 1800000, doc_id, 'm' FROM documents
  UNION ALL
  SELECT doc_id + 2700000, doc_id, 'm' FROM documents
),
dims AS (
  SELECT id, k, fam,
         CASE WHEN fam = 'm' THEN 8 * (1 + k % 3) ELSE 1 + k % 16 END AS w,
         CASE WHEN fam = 'm' THEN 8 * (1 + k % 2) ELSE 1 + k % 12 END AS h
  FROM d
),
grid AS (
  SELECT id, k, fam, w, h, gy.j AS j, gx.i AS i
  FROM dims, range(8) gy(j), range(9) gx(i)
),
sam AS (
  SELECT id, j, i, k, fam, (j * h) // 8 AS y, (i * w) // 9 AS x
  FROM grid
),
lum AS (
  SELECT id, j, i,
         CASE WHEN fam = 'm'
              THEN (k + 11 * (x // 8) + 29 * (y // 8)) % 256
              ELSE (299 * ((k + 5*x + 11*y) % 256)
                    + 587 * ((3*k + 7*x + y) % 256)
                    + 114 * ((2*k + x + 13*y) % 256)) // 1000 END AS g
  FROM sam
),
b AS (
  SELECT a.id, a.j, a.i,
         CASE WHEN a.g > c.g THEN '1' ELSE '0' END AS bit
  FROM lum a JOIN lum c ON a.id = c.id AND a.j = c.j AND c.i = a.i + 1
  WHERE a.i < 8
),
hashes AS (
  SELECT id, string_agg(bit, '' ORDER BY j, i) AS dhash_bits
  FROM b GROUP BY id
)
SELECT dhash_bits, count(*) AS n_docs, min(id) AS min_doc, max(id) AS max_doc
FROM hashes GROUP BY dhash_bits HAVING count(*) >= 2 ORDER BY dhash_bits
""",
        "leadlag_corr_events": """
WITH d AS (
  SELECT CAST(ts AS DATE) AS t,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
shifted AS (
  SELECT -3 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lag(b, 3) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT -2 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lag(b, 2) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT -1 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lag(b, 1) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT 0 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(b AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT 1 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lead(b, 1) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT 2 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lead(b, 2) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
  UNION ALL
  SELECT 3 AS lag, t, CAST(a AS HUGEINT) AS av, CAST(lead(b, 3) OVER (ORDER BY t) AS HUGEINT) AS bv
  FROM d
),
m AS (
  SELECT lag, count(*) AS n, sum(av) AS sa, sum(bv) AS sb,
         sum(av*av) AS saa, sum(bv*bv) AS sbb, sum(av*bv) AS sab
  FROM shifted WHERE bv IS NOT NULL GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0 THEN
         round(CAST(n*sab - sa*sb AS DOUBLE)
               / sqrt(CAST(n*saa - sa*sa AS DOUBLE)
                      * CAST(n*sbb - sb*sb AS DOUBLE)), 9)
       END AS corr
FROM m ORDER BY lag
""",
        # month-period twin of seasonality_orders (r11 verdict task 7:
        # the r11-corrected month-bucket branch, now oracle-checkable)
        "seasonality_month_orders": """
WITH o AS (
  SELECT o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate IS NOT NULL
),
pp AS (
  SELECT month(o_orderdate) AS pos,
         strftime(o_orderdate, '%Y-%m') AS bkt,
         sum(CAST(cents AS HUGEINT)) AS s
  FROM o GROUP BY 1, 2
),
px AS (
  SELECT pos, sum(s) AS sp, CAST(count(*) AS HUGEINT) AS np FROM pp GROUP BY pos
),
t AS (SELECT sum(sp) AS ss, sum(np) AS nn FROM px)
SELECT CAST(pos AS INTEGER) AS pos, CAST(np AS BIGINT) AS n_periods,
       CAST(sp AS BIGINT) AS total_value,
       round(CAST(sp * nn AS DOUBLE) / CAST(np * ss AS DOUBLE), 6) AS index
FROM px CROSS JOIN t ORDER BY pos
""",
        "seasonality_orders": """
WITH o AS (
  SELECT o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate IS NOT NULL
),
pp AS (
  SELECT dayofweek(o_orderdate) + 1 AS pos,
         strftime(o_orderdate, '%Y-%m-%d') AS bkt,
         sum(CAST(cents AS HUGEINT)) AS s
  FROM o GROUP BY 1, 2
),
px AS (
  SELECT pos, sum(s) AS sp, CAST(count(*) AS HUGEINT) AS np FROM pp GROUP BY pos
),
t AS (SELECT sum(sp) AS ss, sum(np) AS nn FROM px)
SELECT CAST(pos AS INTEGER) AS pos, CAST(np AS BIGINT) AS n_periods,
       CAST(sp AS BIGINT) AS total_value,
       round(CAST(sp * nn AS DOUBLE) / CAST(np * ss AS DOUBLE), 6) AS index
FROM px CROSS JOIN t ORDER BY pos
""",
        'interarrival_events': """
WITH e AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS g
  FROM events WHERE ts IS NOT NULL
),
a AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(g) AS HUGEINT) AS sg,
         sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sgg
  FROM e WHERE g IS NOT NULL GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_us,
       CASE WHEN sg > 0 THEN
         round(CAST(n * sgg - sg * sg AS DOUBLE)
               / CAST(sg * sg AS DOUBLE), 9)
       END AS cv2,
       CASE WHEN sg > 0 AND n * sgg - sg * sg >= 0 THEN
         round((sqrt(CAST(n * sgg - sg * sg AS DOUBLE))
                - CAST(sg AS DOUBLE))
               / (sqrt(CAST(n * sgg - sg * sg AS DOUBLE))
                  + CAST(sg AS DOUBLE)), 9)
       END AS burstiness
FROM a ORDER BY event_type
""",
        'winsorized_mean_orders': """
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
pv AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS c FROM o GROUP BY g, v),
cw AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM pv
),
kk AS (SELECT *, (n * 1) // 20 AS k FROM cw),
kept AS (
  SELECT g, n, k, v, c, cum,
         greatest(least(cum, n - k) - greatest(cum - c, k), 0) AS kc
  FROM kk
),
ag AS (
  SELECT g, max(n) AS n, max(k) AS k,
         sum(kc * CAST(v AS HUGEINT)) AS s,
         min(CASE WHEN cum >= k + 1 THEN v END) AS vlo,
         max(CASE WHEN cum - c < n - k THEN v END) AS vhi
  FROM kept GROUP BY g
)
SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n_rows,
       CAST(k AS BIGINT) AS n_clamped_each_side,
       CASE WHEN n > 0 THEN
         round(CAST(s + k * CAST(vlo AS HUGEINT) + k * CAST(vhi AS HUGEINT)
                    AS DOUBLE)
               / CAST(n * 100 AS DOUBLE), 6)
       END AS winsorized_mean
FROM ag ORDER BY o_orderpriority
""",
        'theil_sen_orders': """
WITH d AS (
  SELECT o_orderpriority AS g,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) // 7 AS t,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
p AS (
  SELECT a.g, CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM d a JOIN d b ON a.g = b.g AND a.t < b.t
),
ag AS (
  SELECT g, count(*) AS n_pairs,
         round(quantile_cont(s, 0.5), 6) AS slope_per_period
  FROM p GROUP BY g
),
c AS (SELECT g, count(*) AS n_periods FROM d GROUP BY g)
SELECT c.g AS o_orderpriority, CAST(n_periods AS BIGINT) AS n_periods,
       CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs, slope_per_period
FROM c LEFT JOIN ag USING (g) ORDER BY 1
""",
        'unconverted_clicks_events': """
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         first_value(CASE WHEN event_type = 'purchase' THEN ts END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_ts,
         first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_id
  FROM events
)
SELECT event_id, user_id, ts,
       next_id AS next_outcome_id, next_ts AS next_outcome_ts,
       CASE WHEN next_ts IS NOT NULL THEN
         round((epoch_us(next_ts) - epoch_us(ts)) / 1000000.0, 6)
       END AS gap_seconds
FROM s
WHERE event_type = 'click'
  AND NOT (next_ts IS NOT NULL AND next_ts <= ts + INTERVAL 1 DAY)
ORDER BY event_id
""",
        'rolling_active_events': """
WITH pd AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
fan AS (
  SELECT d + CAST(i AS INTEGER) AS day, u
  FROM pd, range(7) r(i)
)
SELECT strftime(day, '%Y-%m-%d') AS day, count(DISTINCT u) AS n_active
FROM fan GROUP BY 1 ORDER BY day
""",
        'transition_entropy_events': """
WITH s AS (
  SELECT event_type AS y,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS x
  FROM events WHERE ts IS NOT NULL
),
cells AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
  FROM s WHERE x IS NOT NULL GROUP BY x, y
),
cx AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS c1 FROM cells GROUP BY x),
tot AS (
  SELECT CAST(sum(cxy) AS BIGINT) AS n, count(*) AS n_pairs,
         count(DISTINCT x) AS n_states
  FROM cells
),
terms AS (
  SELECT n, n_pairs, n_states,
         -CAST(cxy AS DOUBLE) * (log2(CAST(cxy AS DOUBLE))
                                 - log2(CAST(c1 AS DOUBLE))) AS term
  FROM cells JOIN cx USING (x) CROSS JOIN tot
)
SELECT n AS n_transitions, CAST(n_states AS BIGINT) AS n_states,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list_sort(list(term))),
                         (a, b) -> a + b) / CAST(n AS DOUBLE), 6)
         AS entropy_bits
FROM terms GROUP BY n, n_pairs, n_states
""",
        'interpolate_missing_orders': """
WITH d AS (
  SELECT o_orderpriority AS g,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS t,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v0
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
),
h AS (
  SELECT g, t, CASE WHEN t % 11 = 0 THEN NULL ELSE v0 END AS v FROM d
),
n AS (
  SELECT g, t, v,
         last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
         first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
  FROM h
)
SELECT g AS o_orderpriority, CAST(t AS BIGINT) AS t,
       CASE
         WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
           round(CAST(pv * (nt - t) + nv * (t - pt) AS DOUBLE)
                 / CAST(nt - pt AS DOUBLE), 6)
         WHEN pt IS NOT NULL THEN CAST(pv AS DOUBLE)
         WHEN nt IS NOT NULL THEN CAST(nv AS DOUBLE)
       END AS value_interp
FROM n WHERE v IS NULL ORDER BY o_orderpriority, t
""",
        'sorted_neighborhood_parts': """
WITH r AS (
  SELECT p_partkey AS id, p_name AS k,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
  FROM part WHERE p_name IS NOT NULL
),
p AS (
  SELECT a.id AS id_a, b.id AS id_b, a.k AS key_a, b.k AS key_b,
         CAST(b.rnk - a.rnk AS INTEGER) AS rank_gap,
         levenshtein(a.k, b.k) AS edit_distance
  FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 3
)
SELECT id_a, id_b, key_a, key_b, rank_gap,
       CAST(edit_distance AS INTEGER) AS edit_distance
FROM p WHERE edit_distance <= 2 ORDER BY id_a, id_b
""",
        "wilson_ci_events": """
WITH e AS (
  SELECT user_id % 20 AS segment,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c
  FROM events
),
a AS (
  SELECT segment, CAST(count(*) AS HUGEINT) AS n, CAST(sum(c) AS HUGEINT) AS k
  FROM e GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 9) AS rate,
       greatest(round(
         (CAST(k * 10000 AS DOUBLE) + 38416 / 2.0
          - 19600.0 * sqrt(CAST(k * (n - k) AS DOUBLE) / CAST(n AS DOUBLE)
                           + 38416 / 40000.0))
         / CAST(n * 10000 + 38416 AS DOUBLE), 9), 0.0) AS ci_low,
       least(round(
         (CAST(k * 10000 AS DOUBLE) + 38416 / 2.0
          + 19600.0 * sqrt(CAST(k * (n - k) AS DOUBLE) / CAST(n AS DOUBLE)
                           + 38416 / 40000.0))
         / CAST(n * 10000 + 38416 AS DOUBLE), 9), 1.0) AS ci_high
FROM a ORDER BY segment
""",
        "lang_purity_documents": _lang_purity_oracle(),
        "curate_corpus": f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), s -> s IN {_STOPWORDS_SQL})) AS n_stop,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(text) AS n_chars,
         md5(text) AS h
  FROM documents),
q AS (
  SELECT doc_id, n_tok, h FROM t
  WHERE n_tok >= 10 AND n_stop * 100 <= 50 * n_tok AND n_punct * 100 <= 20 * n_chars),
d AS (SELECT h, min(doc_id) AS doc_id FROM q GROUP BY h)
SELECT d.doc_id, ('0x' || substr(d.h, 1, 15))::BIGINT AS fingerprint, q.n_tok AS n_tokens
FROM d JOIN q ON d.doc_id = q.doc_id AND d.h = q.h
""",
        # the artifact patterns re-use the exact module literals so the
        # two engines count the same byte sequences
        "mojibake_documents": f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 960000, text || ' {_MOJIBAKE_SNIPPET}'
  FROM documents WHERE doc_id % 31 = 0
),
c AS (
  SELECT doc_id, length(text) AS n_chars,
         len(regexp_extract_all(text, '{TX.MOJIBAKE_LATIN1}')) AS n_latin1,
         len(regexp_extract_all(text, '{TX.MOJIBAKE_PUNCT}')) AS n_punct,
         len(regexp_extract_all(text, '{TX.MOJIBAKE_REPL}')) AS n_repl
  FROM base
)
SELECT doc_id, n_chars, n_latin1, n_punct, n_repl,
       n_latin1 + n_punct + n_repl AS n_artifacts,
       round(10000.0 * (n_latin1 + n_punct + n_repl) / n_chars, 9) AS per_10k
FROM c
WHERE n_latin1 + n_punct + n_repl >= 3
ORDER BY doc_id
""",
        "byte_token_budget_documents": """
WITH per AS (
  SELECT lang, length(text) AS c, strlen(text) AS b,
         len(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       -- CAST: HUGEINT sums reach pandas as float64 (driver-red
       -- value-hash class; tools/dtype_audit.py)
       CAST(SUM(c) AS BIGINT) AS n_chars, CAST(SUM(b) AS BIGINT) AS n_bytes,
       CAST(SUM(t) AS BIGINT) AS n_tokens,
       round(SUM(b)::DOUBLE / SUM(c), 9) AS bytes_per_char,
       round(SUM(c)::DOUBLE / SUM(t), 9) AS chars_per_token,
       round(SUM(t)::DOUBLE / COUNT(*), 9) AS tokens_per_doc
FROM per GROUP BY lang ORDER BY lang
""",
        "hard_positives_embeddings": """
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 17, 42)
),
s AS (
  SELECT q.qid, e.vec_id AS pos_id, e.label AS pos_label,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
  FROM embeddings e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid
),
r AS (
  SELECT qid, pos_id, pos_label, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, pos_id DESC) AS rank
  FROM s
)
SELECT qid, CAST(rank AS BIGINT) AS rank, pos_id, pos_label, score
FROM r WHERE rank <= 5 ORDER BY qid, rank
""",
        "line_stats_documents": """
WITH planted AS (
  SELECT doc_id + 970000 AS doc_id,
         '- intro bullet' || chr(10) || text || chr(10) || '...' || chr(10)
         || '- closing bullet' || chr(10) || 'short' || chr(10) || '\u2026' AS text
  FROM documents WHERE doc_id % 13 = 0
),
base AS (
  SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM planted
),
l AS (
  SELECT doc_id, str_split(text, chr(10)) AS ls FROM base
),
c AS (
  SELECT doc_id, len(ls) AS n_lines,
         len(list_filter(ls, x -> starts_with(x, '- ') OR starts_with(x, '* ') OR starts_with(x, '\u2022 '))) AS nb,
         len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '\u2026'))) AS ne,
         len(list_filter(ls, x -> length(x) < 10)) AS ns
  FROM l
)
SELECT doc_id, n_lines,
       round(nb::DOUBLE / n_lines, 9) AS bullet_frac,
       round(ne::DOUBLE / n_lines, 9) AS ellipsis_frac,
       round(ns::DOUBLE / n_lines, 9) AS short_frac
FROM c WHERE n_lines > 1 ORDER BY doc_id
""",
        "ndcg_bm25_documents": """
WITH tok AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tokens
  FROM dl
),
tf AS (
  SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE tok IN ('hash', 'merge', 'spark', 'window') GROUP BY 1, 2
),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.id,
         (log2(CAST(2*c.n_docs + 2 AS DOUBLE)) - log2(CAST(2*d.df_t + 1 AS DOUBLE)))
         * ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
            / (CAST(tf.tf AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
               * (1.0 - CAST(0.75 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE)
                  * (CAST(dl.dl AS DOUBLE) * CAST(c.n_docs AS DOUBLE)
                     / CAST(c.total_tokens AS DOUBLE))))) AS contrib
  FROM tf JOIN dfreq d USING (tok) JOIN dl USING (id) CROSS JOIN corpus c
),
perdoc AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(contrib))),
                           (a, b) -> a + b), 6) AS score
  FROM contrib GROUP BY id
),
top AS (
  SELECT n_terms_hit,
         row_number() OVER (ORDER BY score DESC, id) AS pos
  FROM (SELECT * FROM perdoc ORDER BY score DESC, id LIMIT 20)
),
dcg AS (
  SELECT SUM(CAST(round((pow(2.0, CAST(n_terms_hit AS DOUBLE)) - 1.0)
                        / log2(CAST(pos + 1 AS DOUBLE)), 6) AS DECIMAL(38,6))) AS dcg,
         CAST(count(*) AS BIGINT) AS n_ranked
  FROM top
),
rel AS (
  SELECT id, CAST(count(DISTINCT tok) AS BIGINT) AS rel FROM tok
  WHERE tok IN ('hash', 'merge', 'spark', 'window') GROUP BY id
),
ideal AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, id) AS pos
  FROM (SELECT * FROM rel ORDER BY rel DESC, id LIMIT 20)
),
idcg AS (
  SELECT SUM(CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
                        / log2(CAST(pos + 1 AS DOUBLE)), 6) AS DECIMAL(38,6))) AS idcg
  FROM ideal
)
SELECT 20 AS k, d.n_ranked,
       round(CAST(d.dcg AS DOUBLE), 6) AS dcg,
       round(CAST(i.idcg AS DOUBLE), 6) AS idcg,
       round(CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6) AS ndcg
FROM dcg d CROSS JOIN idcg i
""",
        # script classes are the PINNED explicit ranges (TX.PINNED_*)
        # — RE2's \p{Latin} ships newer Unicode tables than the JVM's
        # \p{IsLatin} and diverges on Unicode-14/15 codepoints
        "script_mix_documents": f"""
WITH per AS (
  SELECT lang, length(text) AS n,
         len(regexp_extract_all(text, '{TX.PINNED_LATIN_CLASS}')) AS lat,
         len(regexp_extract_all(text, '{TX.PINNED_HAN_CLASS}')) AS han,
         len(regexp_extract_all(text, '{TX.PINNED_CYRILLIC_CLASS}')) AS cyr,
         len(regexp_extract_all(text, '[0-9]')) AS dig
  FROM documents
)
SELECT lang,
       -- CAST: HUGEINT sum reaches pandas as float64 (driver-red
       -- value-hash class; tools/dtype_audit.py)
       CAST(SUM(n) AS BIGINT) AS n_chars,
       round(SUM(lat)::DOUBLE / SUM(n), 9) AS latin_share,
       round(SUM(han)::DOUBLE / SUM(n), 9) AS han_share,
       round(SUM(cyr)::DOUBLE / SUM(n), 9) AS cyrillic_share,
       round(SUM(dig)::DOUBLE / SUM(n), 9) AS digit_share
FROM per GROUP BY lang ORDER BY lang
""",
        "dedup_sweep_documents": """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, greatest(len(t)-1, 1))]) AS s
  FROM toks
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
),
t(threshold) AS (VALUES (0.5), (0.6), (0.7), (0.8), (0.9), (1.0)),
e AS (SELECT t.threshold, p.id_a, p.id_b FROM p JOIN t ON p.jaccard >= t.threshold),
g1 AS (SELECT threshold, COUNT(*) AS n_pairs FROM e GROUP BY threshold),
e2 AS (SELECT threshold, unnest([id_a, id_b]) AS doc FROM e),
g2 AS (SELECT threshold, COUNT(DISTINCT doc) AS n_docs FROM e2 GROUP BY threshold)
SELECT g1.threshold, g1.n_pairs, g2.n_docs
FROM g1 JOIN g2 USING (threshold) ORDER BY threshold
""",
        "fix_mojibake_check": """
SELECT source, COUNT(*) AS n_docs,
       COUNT(*) AS n_repaired,
       COUNT(*) FILTER (WHERE regexp_matches(text, '[^[:ascii:]]')) AS n_changed
FROM documents WHERE text IS NOT NULL
GROUP BY source ORDER BY source
""",
        "hard_negatives_embeddings": """
WITH q AS (
  SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 17, 42)
),
s AS (
  SELECT q.qid, e.vec_id AS neg_id, e.label AS neg_label,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
  FROM embeddings e JOIN q ON e.label <> q.qlabel AND e.vec_id <> q.qid
),
r AS (
  SELECT qid, neg_id, neg_label, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, neg_id DESC) AS rank
  FROM s
)
SELECT qid, CAST(rank AS BIGINT) AS rank, neg_id, neg_label, score
FROM r WHERE rank <= 5 ORDER BY qid, rank
""",
    }
    # r13 canary oracles (functions/canary.py — VERDICT task 1):
    # data-independent known-answer probes, routed through the same
    # pinned-tokenizer lint as every other oracle.
    sqls.update(CN.canary_oracles())
    # The single shared oracle-side tokenizer route (r11 verdict task
    # 1): rewrite every '\s+' to the pinned explicit class; raise on
    # any other bare \s. Tested by test_tokenization_law.py.
    return {name: TX.pin_ws_oracle(sql) for name, sql in sqls.items()}
