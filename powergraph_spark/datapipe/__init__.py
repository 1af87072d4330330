from .clean import (
    c4_line_filter,
    hash_split,
    line_dedup,
    mixture_quotas,
    mixture_sample,
    pack_sequences,
    quality_sample,
    split_lines,
    stratified_sample,
)
from .dedup import (
    dedup_exact,
    exact_dup_groups,
    jaccard_pairs,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    positional_gram_hashes,
    simhash,
    simhash_near_dups,
    span_dedup_filter,
    span_dedup_rewrite,
    span_dup_stats,
    word_shingles,
)
from .classifier import (
    hashed_bow,
    predict_quality_lr,
    quality_lr_filter,
    train_quality_lr,
)
from .bpe import bpe_segment, bpe_train, word_vocab
from .decontam import contamination, decontaminate
from .dsir import (
    hashed_unigram_logratio,
    importance_resample,
    importance_scores,
)
from .semdedup import semantic_dedup, semantic_dedup_kept
from .sketch import hll_distinct, hll_estimate, hll_registers
from .multimodal import (
    extract_features,
    image_ahash,
    image_near_dups,
    resize_images,
    sample_frames,
    synthesize_media,
)
from .similarity import (
    brute_force_topk,
    cosine,
    dequantize_embeddings,
    embedding_near_dups,
    ivf_topk,
    lsh_topk,
    quantize_embeddings,
)
from .text import (
    bigram_lm_scores,
    bpe_token_count,
    corpus_ngram_counts,
    doc_fingerprint,
    dup_line_char_fraction,
    dup_line_fraction,
    dup_paragraph_fraction,
    lang_id,
    ppl_buckets,
    ppl_cutoffs,
    quality_score,
    repeated_ngram_char_fraction,
    repetition_filter,
    repetition_stats,
    text_stats,
    tfidf_top_terms,
    token_count,
    top_ngram_char_fraction,
)

__all__ = [
    "exact_dup_groups", "dedup_exact", "word_shingles", "minhash_signatures",
    "minhash_lsh_candidates", "jaccard_pairs", "minhash_dedup",
    "simhash", "simhash_near_dups",
    "positional_gram_hashes", "span_dup_stats", "span_dedup_filter",
    "span_dedup_rewrite",
    "brute_force_topk", "lsh_topk", "ivf_topk", "embedding_near_dups", "cosine",
    "token_count", "bpe_token_count", "quality_score", "lang_id",
    "doc_fingerprint", "text_stats",
    "dup_line_fraction", "dup_paragraph_fraction", "dup_line_char_fraction",
    "top_ngram_char_fraction", "repeated_ngram_char_fraction",
    "repetition_stats", "repetition_filter",
    "synthesize_media", "extract_features", "resize_images", "sample_frames",
    "image_ahash", "image_near_dups",
    "contamination", "decontaminate",
    "semantic_dedup", "semantic_dedup_kept",
    "hashed_unigram_logratio", "importance_scores", "importance_resample",
    "bpe_train", "bpe_segment", "word_vocab",
    "hll_registers", "hll_estimate", "hll_distinct",
    "ppl_cutoffs", "ppl_buckets",
    "stratified_sample", "mixture_quotas", "mixture_sample",
    "split_lines", "line_dedup", "c4_line_filter", "hash_split",
    "quality_sample", "pack_sequences", "corpus_ngram_counts",
    "quantize_embeddings", "dequantize_embeddings",
    "bigram_lm_scores", "tfidf_top_terms",
    "hashed_bow", "train_quality_lr", "predict_quality_lr",
    "quality_lr_filter",
]
