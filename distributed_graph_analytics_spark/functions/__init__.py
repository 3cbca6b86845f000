from distributed_graph_analytics_spark.functions.text import (  # noqa: F401
    detect_language,
    fingerprint_documents,
    quality_score,
    token_count,
)
from distributed_graph_analytics_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from distributed_graph_analytics_spark.functions.similarity import (  # noqa: F401
    brute_force_cosine_topk,
    embedding_near_duplicates,
    lsh_bucketed_cosine_topk,
)
from distributed_graph_analytics_spark.functions.text import (  # noqa: F401
    repetition_ratio,
    scrub_pii,
)
from distributed_graph_analytics_spark.functions.similarity import (  # noqa: F401
    embedding_centroids,
    ivf_cosine_topk,
)
from distributed_graph_analytics_spark.functions.pipeline import (  # noqa: F401
    clean_corpus,
    corpus_disposition,
    deterministic_sample,
    duplicate_clusters,
    stratified_sample,
)
