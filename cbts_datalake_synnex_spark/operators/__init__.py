"""Custom operators the engine adds on top of built-in DataFrame ops.

Preference order (per the build mandate): (a) composition of built-in
ops — used for as-of join, every dedup variant, similarity search,
text analysis; (b) Arrow-batched pandas UDFs via mapInPandas — used
only for multimodal payload processing; (c) mapPartitions — unused.
"""

from cbts_datalake_synnex_spark.operators.joins import asof_join
from cbts_datalake_synnex_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from cbts_datalake_synnex_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    lsh_bucket_topk,
)
from cbts_datalake_synnex_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_counts,
)

__all__ = [
    "asof_join",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "exact_dedup",
    "fingerprint",
    "lang_id",
    "lsh_bucket_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash",
    "simhash_near_dup_pairs",
    "token_counts",
]
