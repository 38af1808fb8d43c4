"""Large-scale training-data pipeline operators.

First-class engine components alongside the OSM conversion core: exact and
near deduplication (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force cosine top-k + sign-bucketed ANN), text
analysis (token stats, quality counts, language id, fingerprinting), and
multimodal binary-column plumbing.

Design rules:
- everything JVM-side (`pyspark.sql.functions`, whole-stage codegen) unless
  semantics require an Arrow kernel;
- all hashes derive from ``md5`` -> 60-bit bigint so an ANSI-SQL oracle
  (DuckDB) reproduces results bit-for-bit — no engine-private hash in any
  user-visible result;
- heavy ops aggregate before they shuffle (distinct shingles per doc, band
  buckets before pair expansion) and block before they pair (O(n^2) only
  within a bounded block).
"""

from .dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shared_token_runs,
    shingles_col,
    simhash,
    simhash_near_duplicates,
)
from .search import (bm25_topk, bm25_topk_indexed, corpus_globals,
                     corpus_term_stats, ngram_topk)
from .similarity import (
    brute_force_topk,
    cluster_sizes,
    embedding_near_duplicates,
    ivf_topk,
    kmeans_assign,
    kmeans_centroids,
    recall_at_k,
    sign_lsh_multi_topk,
    sign_lsh_topk,
)
from .cluster import connected_components, near_dup_clusters
from .bfs import bfs_hops, cheapest_path
from .pagerank import pagerank
from .sketch import (cms_merge, cms_query, cms_sketch,
                     hist_merge, hist_quantiles, hist_sketch,
                     hll_estimate, hll_merge, hll_sketch,
                     kmv_estimate, kmv_merge, kmv_set_ops, kmv_sketch)
from .project import projection_signs, random_projection
from .semdedup import semantic_dedup
from .compose import clean_corpus
from .packing import chunk_documents, pack_sequences
from .scrub import decontaminate, pii_scrub
from .text import (
    doc_fingerprint,
    language_id,
    quality_counts,
    repetition_stats,
    token_counts,
    token_hash_col,
    unigram_logprob,
    winnowing_fingerprints,
)

__all__ = [
    "clean_corpus",
    "cms_merge",
    "cms_query",
    "cms_sketch",
    "connected_components",
    "bfs_hops",
    "cheapest_path",
    "pagerank",
    "hist_merge",
    "hist_quantiles",
    "hist_sketch",
    "hll_estimate",
    "hll_merge",
    "hll_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_set_ops",
    "kmv_sketch",
    "decontaminate",
    "near_dup_clusters",
    "pii_scrub",
    "projection_signs",
    "random_projection",
    "exact_duplicates",
    "minhash_near_duplicates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "shared_token_runs",
    "shingles_col",
    "simhash",
    "simhash_near_duplicates",
    "bm25_topk",
    "bm25_topk_indexed",
    "corpus_globals",
    "corpus_term_stats",
    "ngram_topk",
    "brute_force_topk",
    "cluster_sizes",
    "embedding_near_duplicates",
    "ivf_topk",
    "kmeans_assign",
    "kmeans_centroids",
    "recall_at_k",
    "semantic_dedup",
    "sign_lsh_multi_topk",
    "sign_lsh_topk",
    "doc_fingerprint",
    "language_id",
    "quality_counts",
    "repetition_stats",
    "token_counts",
    "chunk_documents",
    "pack_sequences",
    "unigram_logprob",
    "token_hash_col",
    "winnowing_fingerprints",
]
