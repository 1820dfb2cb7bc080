from diseasystore_spark.pipeline.dedup import (
    dedup_components,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_join,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash64,
    simhash_pairs,
)
from diseasystore_spark.pipeline.sample import (
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
)
from diseasystore_spark.pipeline.shard import (
    read_shard,
    reshard_corpus,
    shard_column,
    write_corpus_shards,
)
from diseasystore_spark.pipeline.similarity import (
    cosine_topk,
    embedding_dupes,
    hyperplane_lsh_topk,
    ivf_topk,
)
from diseasystore_spark.pipeline.text import (
    bm25_top_terms,
    chunk_documents,
    curate_corpus,
    doc_fingerprints,
    langid_heuristic,
    term_frequencies,
    text_stats,
    tfidf_top_terms,
)

__all__ = [
    "bm25_top_terms",
    "chunk_documents",
    "cosine_topk",
    "curate_corpus",
    "dedup_components",
    "doc_fingerprints",
    "embedding_dupes",
    "exact_dup_groups",
    "hash_sample",
    "hash_split",
    "hyperplane_lsh_topk",
    "ivf_topk",
    "jaccard_pairs",
    "langid_heuristic",
    "minhash_lsh_join",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "pack_sequences",
    "read_shard",
    "reshard_corpus",
    "shard_column",
    "simhash64",
    "simhash_pairs",
    "stratified_sample",
    "term_frequencies",
    "text_stats",
    "tfidf_top_terms",
    "write_corpus_shards",
]
