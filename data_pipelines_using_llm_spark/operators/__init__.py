"""Operator library: every function is ``DataFrame -> DataFrame`` (or a
Column builder) so pipelines compose into single Catalyst plans."""

from data_pipelines_using_llm_spark.operators.asof import asof_join  # noqa: F401
from data_pipelines_using_llm_spark.operators.cleaning import (  # noqa: F401
    clean,
    dedup_deterministic,
    dedup_full_row,
    dedup_keep_any,
    drop_any_null,
    keep_if_any_present,
)
from data_pipelines_using_llm_spark.operators.dedup import (  # noqa: F401
    gram_hash_df,
    jaccard,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_df,
    simhash_pairs,
)
from data_pipelines_using_llm_spark.operators.llm import (  # noqa: F401
    StubBackend,
    llm_transform,
)
from data_pipelines_using_llm_spark.operators.multimodal import (  # noqa: F401
    decode_stats,
    frame_sample,
    media_table,
    resize_image,
)
from data_pipelines_using_llm_spark.operators.quality import (  # noqa: F401
    duplicate_profile,
    null_profile,
)
from data_pipelines_using_llm_spark.operators.similarity import (  # noqa: F401
    cosine_pairs,
    knn_brute_force,
    knn_ivf,
    knn_lsh,
)
from data_pipelines_using_llm_spark.operators.skew import (  # noqa: F401
    salted_agg,
    salted_join,
)
from data_pipelines_using_llm_spark.operators.text import (  # noqa: F401
    fingerprint,
    language_id,
    quality_score,
    token_count,
    tokens,
)
