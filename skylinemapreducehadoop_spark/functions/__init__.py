from skylinemapreducehadoop_spark.functions.profile import profile
from skylinemapreducehadoop_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_flags,
    text_stats,
    token_count,
)

__all__ = [
    "profile",
    "text_stats",
    "quality_flags",
    "language_id",
    "doc_fingerprint",
    "token_count",
    "bpe_ish_token_count",
]
