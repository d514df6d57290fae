from plato_spark.functions.text import (  # noqa: F401
    token_count_col,
    text_quality,
    doc_fingerprint,
    lang_id_ngram,
)
from plato_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_lsh_candidates,
    simhash_signatures,
)
from plato_spark.functions.similarity import (  # noqa: F401
    cosine_sim_col,
    brute_force_topk,
    threshold_neighbors,
    lsh_bucketed_neighbors,
)
