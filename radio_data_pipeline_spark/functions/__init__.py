from radio_data_pipeline_spark.functions.text import (  # noqa: F401
    word_tokens,
    bpe_ish_token_count,
    punct_count,
    stopword_hits,
    quality_score,
    language_id,
    fingerprint,
)
from radio_data_pipeline_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    word_shingles,
    minhash_signature,
    minhash_lsh_pairs,
    band_table,
    greedy_band_survivors,
    ngram_jaccard_pairs,
    simhash64,
)
from radio_data_pipeline_spark.functions.similarity import (  # noqa: F401
    dot_product,
    l2_norm,
    cosine_similarity,
    cosine_topk,
    lsh_bucket_topk,
)
