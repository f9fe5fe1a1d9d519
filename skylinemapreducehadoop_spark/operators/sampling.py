"""Sampling operators for corpus curation.

Training-data pipelines need REPRODUCIBLE samples: the same corpus must
yield the same sample on any cluster layout, any engine, any day.
Spark's ``df.sample``/``rand()`` are seeded per-partition, so results
shift whenever partitioning shifts — fine for statistics, wrong for
datasets. The operators here are therefore *content-hash* based
(md5 → uniform in [0, buckets)), which makes them deterministic,
partitioning-independent, and cross-engine verifiable in plain SQL
(DuckDB: ``('0x' || substr(md5(k), 1, 15))::BIGINT % buckets``).

- ``hash_sample``: Bernoulli-style keep-if-bucket-below-threshold. One
  narrow filter, fully pushdown-friendly; no shuffle at all.
- ``stratified_hash_sample``: per-stratum rates via a tiny broadcast
  rate table; same zero-shuffle shape.
- ``reservoir_sample``: exact-k uniform sample via TakeOrdered on the
  hash key (per-partition top-k heaps + driver merge of k×partitions
  rows — no full sort). Deterministic for a given key.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


#: stands in for NULL inside the concatenated key — concat_ws would
#: silently SKIP nulls, making ('a', NULL, 'b') and ('a', 'b', NULL)
#: hash identically; the sentinel preserves NULL position. (A non-null
#: value equal to the sentinel would collide — \x00 never occurs in
#: sane text keys.)
_NULL_SENTINEL = "\x00NULL"


def _hash_bucket(key_cols: Sequence[str | Column], buckets: int) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of the concatenated
    key columns (60-bit prefix — same expression DuckDB can evaluate).
    NULL key components are encoded positionally via a sentinel."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    key = F.concat_ws(
        "\x1f", *[F.coalesce(c.cast("string"), F.lit(_NULL_SENTINEL)) for c in cols]
    )
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str | Column],
    fraction: float,
    *,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on content.

    Same key → same keep/drop decision everywhere, so downstream joins
    between independently-sampled tables stay consistent when they share
    the key. Zero shuffle: one filter the optimizer can push around.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * buckets))
    return df.where(_hash_bucket(key_cols, buckets) < F.lit(threshold))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    key_cols: Sequence[str | Column] | None = None,
    default_fraction: float = 0.0,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-
    heavy domains, keep all rare-language docs).

    The per-stratum thresholds compile to one CASE expression — still a
    single narrow filter, no shuffle, no RNG.

    ``key_cols`` decides WHICH rows within a stratum are kept and is
    required whenever any fraction is strictly between 0 and 1: keying
    on the stratum column alone would give every row of a stratum the
    SAME bucket, so a fractional rate would keep 100% or 0% of the
    stratum instead of ~rate. (With only 0/1 rates the key is
    irrelevant and may be omitted.)
    """
    fractional = any(0.0 < f < 1.0 for f in fractions.values()) or (
        0.0 < default_fraction < 1.0
    )
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1], got {frac}")
    if key_cols is None and fractional:
        raise ValueError(
            "stratified_hash_sample needs key_cols for fractional rates: "
            "keying on the stratum column alone keeps 100% or 0% of each "
            "stratum (every row hashes to the same bucket). Pass the "
            "columns that identify a row, e.g. key_cols=['text']."
        )
    key_cols = list(key_cols) if key_cols is not None else [strata_col]
    bucket = _hash_bucket(key_cols, buckets)
    thresh: Column = F.lit(int(round(default_fraction * buckets)))
    for s, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(frac * buckets)))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def mix_corpus(
    df: DataFrame,
    weights: Mapping[str, int],
    *,
    strata_col: str = "source",
    key_cols: Sequence[str | Column] = ("text",),
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Downsample strata to target mixing proportions — the corpus-
    mixing step of a training-data pipeline (e.g. 4:3:2:2:1 across
    sources).

    Keeps the LARGEST corpus achievable by downsampling only: the
    scale is set by the stratum with the smallest ``n_s / w_s`` ratio
    (kept whole); every other stratum is thinned to match. Thresholds
    use pure integer arithmetic — ``floor(buckets * n_m * w_s /
    (w_m * n_s))`` — so the decision is bit-exact on any engine, and
    row selection is content-hash based (partitioning-independent, see
    module docstring). Strata absent from ``weights`` are dropped.

    Scale shape: one count aggregate over the stratum column (map-side
    combined), a tiny broadcast threshold table, then a single narrow
    filter — no data-sized shuffle.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w <= 0 or int(w) != w:
            raise ValueError(f"weight for stratum {s!r} must be a positive int, got {w}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in weights.items()], f"{strata_col} string, __wt long"
    )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n")).join(wdf, strata_col)
    # scale-setting stratum = argmin of n/wt; lexicographic struct min
    # gives a deterministic tiebreak (ratio, n, wt) — and tied ratios
    # yield identical thresholds regardless of which row wins (equal
    # rationals floor identically)
    m = counts.agg(
        F.min(
            F.struct(
                (F.col("__n").cast("double") / F.col("__wt")).alias("__r"),
                F.col("__n").alias("__nm"),
                F.col("__wt").alias("__wm"),
            )
        ).alias("__m")
    ).select(F.col("__m.__nm").alias("__nm"), F.col("__m.__wm").alias("__wm"))
    thr = counts.crossJoin(F.broadcast(m)).select(
        strata_col,
        F.expr(f"({buckets}L * __nm * __wt) div (__wm * __n)").alias("__thr"),
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .where(_hash_bucket(key_cols, buckets) < F.col("__thr"))
        .drop("__thr")
    )


def reservoir_sample(
    df: DataFrame,
    k: int,
    key_cols: Sequence[str | Column],
    *,
    buckets: int = 1 << 62,
) -> DataFrame:
    """Exact-``k`` deterministic uniform sample: the k rows with the
    smallest content-hash. Executes as TakeOrdered (per-partition
    heaps), never a full sort; ties beyond the hash are broken by the
    key itself so the result is total-order stable."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    return (
        df.withColumn("__h", _hash_bucket(key_cols, buckets))
        .orderBy("__h", *cols)
        .limit(k)
        .drop("__h")
    )


def stratified_topk_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_cols: Sequence[str | Column],
    *,
    buckets: int = 1 << 62,
    tiebreak_cols: Sequence[str | Column] = (),
) -> DataFrame:
    """Exact-``k``-PER-STRATUM deterministic sample: within each
    stratum, the k rows with the smallest content hash, ties broken by
    the key itself and then ``tiebreak_cols``.

    The order is a TOTAL order (stable under any partitioning) only if
    (key_cols + tiebreak_cols) uniquely identifies rows within a
    stratum: two rows with identical key values tie on both the hash
    and the key, and which one wins rank k is then partition-dependent.
    Pass the table's unique id in ``tiebreak_cols`` whenever the key
    (e.g. document text) can repeat.

    The per-stratum analogue of :func:`reservoir_sample`: build
    balanced eval sets (k docs per language/source) without a global
    sort. One shuffle on the stratum key; the rank window runs
    per-stratum, so no single task ever sees more than a stratum.
    A skewed giant stratum still sorts only within its partition
    group — for pathological single-stratum skew, pre-filter with
    :func:`hash_sample` to cap the window input.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    ties = [F.col(c) if isinstance(c, str) else c for c in tiebreak_cols]
    w = Window.partitionBy(strata_col).orderBy(F.col("__h"), *cols, *ties)
    return (
        df.withColumn("__h", _hash_bucket(key_cols, buckets))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: Sequence[str | Column],
    *,
    tiebreak_cols: Sequence[str | Column] = (),
    buckets: int = 1 << 52,
) -> DataFrame:
    """Exact-``k`` deterministic WEIGHTED sample without replacement
    (Efraimidis & Spirakis, "Weighted random sampling with a
    reservoir", IPL 2006): each row draws u uniform in (0, 1] from its
    content hash and gets priority u^(1/w); the k largest priorities
    are the sample — inclusion probability proportional to weight at
    each sequential draw. RNG-free and layout-independent like the
    rest of the sampling family (importance-sample a corpus by token
    count / quality score and get the SAME rows on any engine).

    Ranking uses the monotone-equivalent ``ln(u)/w`` (descending) —
    no pow; u is an exactly-representable rational (52-bit hash grid),
    so both the draw and its log reproduce cross-engine. Executes as
    TakeOrdered (per-partition heaps), never a global sort. Rows with
    NULL or non-positive weight are excluded; pass a unique id in
    ``tiebreak_cols`` when the key can repeat.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ties = [F.col(c) if isinstance(c, str) else c for c in tiebreak_cols]
    u = (_hash_bucket(key_cols, buckets) + 1).cast("double") / F.lit(
        float(buckets + 1)
    )
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), *ties)
        .limit(k)
        .drop("__pri")
    )


def temperature_mix(
    df: DataFrame,
    *,
    strata_col: str = "source",
    key_cols: Sequence[str | Column] = ("text",),
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Temperature-based corpus rebalancing at alpha = 0.5 (the
    multilingual-pretraining standard): target stratum shares
    proportional to ``sqrt(n_s)`` instead of ``n_s``, which upsamples
    the tail sources RELATIVELY by downsampling the heads. Like
    :func:`mix_corpus`, the kept corpus is the LARGEST achievable by
    downsampling only — the scale is set by the stratum minimizing
    ``n_s / w_s`` with ``w_s = floor(sqrt(n_s))`` (kept whole); every
    other stratum is thinned to match via the same content-hash
    threshold ``floor(buckets * n_m * w_s / (w_m * n_s))``.

    ``floor(sqrt(n))`` uses the correctly-rounded IEEE double sqrt —
    bit-identical across engines for any count below 2^52, so the
    thresholds (and hence the exact kept row set) are reproducible in
    plain SQL. Row selection is content-hash based: partitioning- and
    engine-independent.

    Scale shape: one count aggregate over the stratum column
    (map-side combined), a broadcast threshold table, one narrow
    filter — no data-sized shuffle.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.select(
        strata_col, "__n", F.floor(F.sqrt(F.col("__n"))).cast("long").alias("__wt")
    ).where(F.col("__wt") > 0)
    m = weighted.agg(
        F.min(
            F.struct(
                (F.col("__n").cast("double") / F.col("__wt")).alias("__r"),
                F.col("__n").alias("__nm"),
                F.col("__wt").alias("__wm"),
            )
        ).alias("__m")
    ).select(F.col("__m.__nm").alias("__nm"), F.col("__m.__wm").alias("__wm"))
    thr = weighted.crossJoin(F.broadcast(m)).select(
        strata_col,
        F.expr(f"({buckets}L * __nm * __wt) div (__wm * __n)").alias("__thr"),
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .where(_hash_bucket(key_cols, buckets) < F.col("__thr"))
        .drop("__thr")
    )


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: Mapping[str, int] | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/val/test assignment that can NEVER split a near-duplicate
    cluster across splits — the eval-contamination guard a plain
    per-document hash split does not give (two near-dup docs hash
    independently, so one lands in train and its twin in test).

    ``dup_pairs`` is any near-dup pair frame (minhash, simhash,
    containment, ...). Pairs are closed into connected components
    (hash-min label propagation from ``operators.dedup``); documents in
    no pair form singleton clusters. The split bucket is the content
    hash of the CLUSTER id, so membership is a pure function of the
    cluster — every member inherits the same split on any engine, any
    layout, any day (the ``hash_sample`` md5 determinism contract).

    ``weights`` maps split name -> integer percent, summing to 100
    (default {"train": 80, "val": 10, "test": 10}); iteration order
    fixes the bucket layout, so pass an ordered mapping. Returns
    (id, cluster_id, split).

    Scale shape: the component closure is the star/hash-min fixed
    point (edge-table-sized rounds); the split itself adds one
    left join (pairs are a tiny fraction of the corpus — the join's
    build side is the duplicate subset only) and a narrow hash
    projection. No new shuffle beyond the closure.
    """
    from skylinemapreducehadoop_spark.operators.dedup import dedup_clusters

    if weights is None:
        weights = {"train": 80, "val": 10, "test": 10}
    total = sum(weights.values())
    if total != 100 or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integer percents summing to 100")

    pairs = dup_pairs.select(
        F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
    )
    clusters = dedup_clusters(pairs)  # (doc_id, cluster_id)
    labeled = (
        df.select(F.col(id_col).alias("id"))
        .join(
            clusters.select(
                F.col("doc_id").alias("id"), F.col("cluster_id")
            ),
            "id",
            "left",
        )
        .select(
            "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
        )
    )
    bucket = _hash_bucket([F.col("cluster_id")], 100)
    split: Column | None = None
    edge = 0
    for name, w in weights.items():
        edge += w
        cond = bucket < edge
        split = F.when(cond, name) if split is None else split.when(cond, name)
    return labeled.select("id", "cluster_id", split.alias("split"))


def negative_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    buckets: int = 64,
    exclude_pairs: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document gets up to ``k`` negatives drawn from the corpus —
    reproducible on any engine/layout (no RNG), never an exact
    duplicate of the anchor, and never a pair listed in
    ``exclude_pairs`` (pass a near-dup pair frame to keep semantic
    twins out of the negative set). Returns (id, neg_id).

    Construction: documents hash into ``buckets`` md5 buckets; the
    ``k`` lowest-hash documents of each bucket form its candidate
    slate, and an anchor in bucket b takes the slate of bucket
    (b+1) mod buckets. Because the md5 is a content hash, "which
    slate" and "who is on it" are pure functions of the corpus.

    Scale shape: the slate table is buckets x k rows — broadcast
    sized by construction, so the anchor join is a broadcast hash
    join, no shuffle of the corpus; the slate itself needs one
    bucket-partitioned top-k window (bounded by bucket population,
    ~|corpus|/buckets — size ``buckets`` so that fits an executor,
    e.g. 1M buckets at 100 TB). Exact-dup anchors are excluded by
    comparing content hashes, near-dups by the optional anti-join
    (both orientations) against ``exclude_pairs``.
    """
    if k < 1 or buckets < 2:
        raise ValueError("need k >= 1 and buckets >= 2")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(text_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")
    base = df.select(
        F.col(id_col).alias("id"),
        h.alias("__h"),
        F.pmod(h, F.lit(buckets)).alias("__b"),
    )
    w = Window.partitionBy("__b").orderBy("__h", "id")
    slate = (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("__b").alias("__slate_b"),
            F.col("id").alias("neg_id"),
            F.col("__h").alias("__neg_h"),
        )
    )
    anchors = base.withColumn(
        "__slate_b", F.pmod(F.col("__b") + 1, F.lit(buckets))
    )
    pairs = (
        anchors.join(F.broadcast(slate), "__slate_b")
        .where(
            (F.col("id") != F.col("neg_id")) & (F.col("__h") != F.col("__neg_h"))
        )
        .select("id", "neg_id")
    )
    if exclude_pairs is not None:
        ex = exclude_pairs.select(
            F.col(id_a).alias("id"), F.col(id_b).alias("neg_id")
        )
        ex = ex.unionByName(
            ex.select(F.col("neg_id").alias("id"), F.col("id").alias("neg_id"))
        )
        pairs = pairs.join(ex, ["id", "neg_id"], "left_anti")
    return pairs


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
    *,
    payload_cols: Sequence[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Top-``k`` rows per group as a MAP-SIDE-COMBINABLE aggregate —
    the scale-safe alternative to the ``row_number()`` window for
    per-group leaderboards. A rank window shuffles EVERY row of every
    group through one Exchange+Sort; this shape combines each input
    partition's contribution down to k rows per (group, partition)
    first (the kmv_sketch two-level bottom-k), so only
    k x partials rows per group ever cross the wire — at 100 TB with
    mega-groups that is the difference between shuffling the table and
    shuffling a leaderboard.

    ``order_cols`` must be a UNIQUE total order within each group
    (append a key column as the last tie-break — with a non-unique
    order the payload struct would silently become the tie-break);
    ``descending`` applies to the whole composite key (the oracle twin
    is ``ORDER BY o1 DESC, o2 DESC, ...``). Returns one row per kept
    input row: group cols + ``rank`` (1-based) + payload cols
    (defaults to the order cols).

    Exactness: top-k is an algebraic aggregate (merge = concat, sort,
    truncate), so the result is partitioning-independent — asserted by
    the window-equality pytest.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    groups = list(group_cols)
    orders = list(order_cols)
    payload = list(payload_cols) if payload_cols is not None else orders
    if not groups or not orders:
        raise ValueError("group_cols and order_cols must be non-empty")
    # sort key: negate nothing — array_sort on structs is ascending by
    # field order, so for descending ranks we sort on inverted marker
    # via reverse() after the ascending sort (exact, no float negation)
    row = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(orders)],
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
    )
    part = df.groupBy(*groups, F.spark_partition_id().alias("__pid")).agg(
        F.slice(
            F.reverse(F.array_sort(F.collect_list(row)))
            if descending
            else F.array_sort(F.collect_list(row)),
            1,
            k,
        ).alias("__top")
    )
    merged = part.groupBy(*groups).agg(
        F.slice(
            F.reverse(F.array_sort(F.flatten(F.collect_list("__top"))))
            if descending
            else F.array_sort(F.flatten(F.collect_list("__top"))),
            1,
            k,
        ).alias("__top")
    )
    out = merged.select(
        *groups, F.posexplode("__top").alias("__i", "__r")
    ).select(
        *groups,
        (F.col("__i") + 1).alias("rank"),
        *[F.col(f"__r.__p.{c}").alias(c) for c in payload],
    )
    return out


def mix_diversity(
    df: DataFrame,
    group_col: str,
    unit_col: str,
) -> DataFrame:
    """Diversity indices of a categorical mix per group — the
    training-mix health screen ("how many EFFECTIVE sources feed each
    language slice?", "did the crawl collapse onto one domain?").

    Per group over the ``unit_col`` share distribution p_i = n_i / N:

    - ``shannon_h`` = -sum p_i ln p_i, computed as
      ``ln N - (sum n_i ln n_i) / N`` with each term
      ``round(n_i * ln n_i, 6)`` summed in decimal — rounding BEFORE
      the fold makes the sum order-free (the survival_km / chi2
      discipline), and ln sits at the libm edge per token_entropy.
    - ``effective_units`` = exp(shannon_h) (Hill number of order 1 —
      "equivalent number of equally-sized sources"), exp applied to
      the ALREADY-ROUNDED entropy so both factors of the composition
      are pinned.
    - ``simpson`` = 1 - sum n_i(n_i-1) / (N(N-1)) (Gini-Simpson,
      unbiased form) — exact integer algebra, one pinned division.

    Scale shape: one map-side-combined aggregate to the (group, unit)
    frame, one aggregate to the group frame. No window, no collect.
    """
    per_unit = (
        df.where(F.col(unit_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"), F.col(unit_col).alias("__u")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    nd = F.col("__n").cast("double")
    term = F.round(nd * F.log(nd), 6).cast("decimal(38,6)")
    pair = (F.col("__n") * (F.col("__n") - 1)).cast("decimal(38,0)")
    agg = per_unit.groupBy("__g").agg(
        F.sum("__n").alias("__N"),
        F.count(F.lit(1)).alias("__k"),
        F.sum(term).alias("__slog"),
        F.sum(pair).alias("__pairs"),
    )
    big_n = F.col("__N").cast("double")
    h = F.round(
        F.log(big_n) - F.col("__slog").cast("double") / big_n, 6
    )
    simpson = F.when(
        F.col("__N") > 1,
        F.round(
            F.lit(1.0)
            - F.col("__pairs").cast("double")
            / (F.col("__N") * (F.col("__N") - 1)).cast("double"),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__N").cast("long").alias("n_rows"),
        F.col("__k").cast("long").alias("n_units"),
        h.alias("shannon_h"),
        F.round(F.exp(h), 6).alias("effective_units"),
        simpson.alias("simpson"),
    )


def balanced_shards(
    df: DataFrame,
    size_col: str,
    *,
    n_shards: int = 8,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Assign rows to ``n_shards`` size-balanced shards — the
    throughput-critical sharding step before distributed training
    (unbalanced shards stall every step on the slowest worker).
    Deterministic striped-LPT: rows rank globally by DESCENDING size
    (ties by id), and rank r goes to shard (r-1) mod n_shards —
    round-robin over the sorted sequence, the classic
    provably-near-balanced streaming relaxation of longest-processing-
    time scheduling (no sequential bin state, so it distributes).

    Returns the per-shard summary: (shard, n_rows, total_size,
    max_size, balance) where ``balance`` = shard total / ideal
    (grand total / n_shards), rounded to 9 — 1.0 is perfect. Join the
    ranked assignment back by id for the per-row shard map (the
    summary keeps the driver-checkable output small).

    Scale shape: the :func:`global_row_number` distributed prefix sum
    (range partition, no single-partition window) + one
    n_shards-row aggregate with a 1-row grand-total broadcast.
    """
    from ..operators.stats import global_row_number

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    order = [F.desc(size_col)] + [F.asc(c) for c in id_cols]
    ranked = global_row_number(
        df.where(F.col(size_col).isNotNull()), order, out_col="__rn"
    ).withColumn(
        "shard", ((F.col("__rn") - 1) % F.lit(n_shards)).cast("int")
    )
    per = ranked.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(size_col).cast("decimal(38,0)")).alias("__tot"),
        F.max(F.col(size_col).cast("long")).alias("max_size"),
    )
    grand = per.groupBy().agg(F.sum("__tot").alias("__g"))
    return (
        per.crossJoin(F.broadcast(grand))
        .select(
            "shard",
            "n_rows",
            F.col("__tot").cast("long").alias("total_size"),
            "max_size",
            F.round(
                F.col("__tot").cast("double")
                * F.lit(float(n_shards))
                / F.col("__g").cast("double"),
                9,
            ).alias("balance"),
        )
        .orderBy("shard")
    )
