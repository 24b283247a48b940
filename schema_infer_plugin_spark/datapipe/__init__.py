"""Training-data pipeline operators over documents/embeddings tables.

Beyond the reference's operator set: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding near-dup), approximate nearest-neighbor search, text
analytics (language ID, quality, token counts, fingerprints), and multimodal
binary-column plumbing. All hashing derives from md5 so every result is
verifiable in DuckDB (functions/hashing.py).
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    banded_signatures,
    lsh_candidate_pairs,
    lsh_pairs_vs_index,
    simhash,
    simhash_candidate_pairs,
    ngram_jaccard_pairs,
    ngram_containment_pairs,
    embedding_neardup_pairs,
    semantic_dedup_pairs,
    contamination_matrix,
)
from .ann import ann_bruteforce_topk, ann_ivf_topk, ann_lsh_topk, ivf_centroids  # noqa: F401
from .ann import ann_ivfpq_topk, ann_pq_topk, pq_codebook, pq_encode, pq_reconstruct  # noqa: F401
from .retrieval import (  # noqa: F401
    bm25_topk,
    hashed_cosine_topk,
    hashed_tf_vector,
    rrf_fuse,
    tfidf_top_terms,
)
from .index_store import (  # noqa: F401
    build_vector_index,
    load_ivf_centroids,
    load_pq_codebook,
    save_ivf_centroids,
    save_pq_codebook,
)
from .convstats import (  # noqa: F401
    conversation_features,
    conversation_texts,
    shared_prefixes,
)
from .examples import sft_examples  # noqa: F401
from .graph import (  # noqa: F401
    canonical_docs,
    connected_components,
    dedup_impact_report,
)
from .mixing import mix_temperature_sample, mix_token_budget  # noqa: F401
from .packing import pack_sequences  # noqa: F401
from .sessions import session_stats, sessionize  # noqa: F401
from .pipeline import clean_corpus  # noqa: F401
from .text import (  # noqa: F401
    boilerplate_ngrams,
    dup_ngram_rate,
    language_id_table,
    quality_funnel,
    text_quality_table,
)
from .multimodal import (  # noqa: F401
    extract_binary_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
