from skylinemapreducehadoop_spark.operators.skyline import (
    skyline,
    skyline_by,
    skyline_kband,
    skyline_layers,
)
from skylinemapreducehadoop_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup,
)
from skylinemapreducehadoop_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup,
    ivf_build,
    ivf_probe,
    ivf_read,
    ivf_topk,
    ivf_write,
)
from skylinemapreducehadoop_spark.operators.temporal import asof_join, range_join
from skylinemapreducehadoop_spark.operators.skew import salted_agg, salted_join
from skylinemapreducehadoop_spark.operators.sampling import (
    hash_sample,
    reservoir_sample,
    stratified_hash_sample,
)

__all__ = [
    "asof_join",
    "range_join",
    "hash_sample",
    "reservoir_sample",
    "stratified_hash_sample",
    "salted_agg",
    "salted_join",
    "ivf_build",
    "ivf_probe",
    "ivf_read",
    "ivf_topk",
    "ivf_write",
    "skyline",
    "skyline_by",
    "skyline_kband",
    "skyline_layers",
    "exact_dedup",
    "minhash_near_dup",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dup",
    "ann_lsh_topk",
    "cosine_topk",
    "embedding_near_dup",
]
