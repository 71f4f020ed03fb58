from .text import (  # noqa: F401
    token_count_col,
    subtoken_count_col,
    stopword_hits_col,
    quality_score_cols,
    langid_col,
    fingerprint_col,
    rolling_hash_col,
)
from .minhash import (  # noqa: F401
    with_shingles,
    with_hashed_shingles,
    with_hset,
    minhash_signatures,
    minhash_signatures_arrow,
    with_minhash_signature,
    lsh_candidate_pairs,
    verified_near_dups,
    with_simhash,
    simhash_near_dups,
)
from .similarity import (  # noqa: F401
    cosine_sim_col,
    cosine_topk,
    lsh_bucketed_topk,
    with_lsh_buckets,
)
