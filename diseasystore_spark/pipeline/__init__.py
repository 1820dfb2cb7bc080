from diseasystore_spark.pipeline.dedup import (
    exact_dup_groups,
    jaccard_pairs,
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
from diseasystore_spark.pipeline.similarity import (
    cosine_topk,
    hyperplane_lsh_topk,
)
from diseasystore_spark.pipeline.text import (
    doc_fingerprints,
    langid_heuristic,
    text_stats,
)

__all__ = [
    "cosine_topk",
    "doc_fingerprints",
    "exact_dup_groups",
    "hash_sample",
    "hash_split",
    "hyperplane_lsh_topk",
    "jaccard_pairs",
    "langid_heuristic",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "pack_sequences",
    "simhash64",
    "simhash_pairs",
    "stratified_sample",
    "text_stats",
]
