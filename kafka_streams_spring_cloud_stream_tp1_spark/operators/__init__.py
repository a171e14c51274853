from .asof import asof_join  # noqa: F401
from .core import (  # noqa: F401
    filter_min_value,
    latest_window_per_key,
    rekey_by_page,
    unwrap_windowed_key,
    windowed_page_counts,
)
from .dedup import (  # noqa: F401
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dup_groups,
    simhash_signatures,
)
from .hashing import fan_out, perm_masks, xhash, xhash_sql  # noqa: F401
from .multimodal import attach_binary_payload, extract_features, sample_frames  # noqa: F401
from .similarity import (  # noqa: F401
    ann_ivf,
    ann_lsh,
    block_cosine_pairs,
    cosine_pairs,
    knn_bruteforce,
)
from .text import (  # noqa: F401
    with_fingerprints,
    with_lang_id,
    with_text_stats,
    with_token_counts,
)
from .udx import chunk_documents, weighted_value_by_type, with_readability  # noqa: F401
