"""LLM-data-pipeline operators over DataFrames (no reference counterpart;
mandated by BASELINE.json beyond the spark-xml surface — SURVEY.md §2.3).

Everything here is expressed with JVM-side built-in functions (whole-stage
codegen) wherever possible; Python appears only in Arrow-batched UDFs where
built-ins genuinely can't express the semantics. Every operator is designed
for the 1000-executor / 100 TB case first: banded LSH instead of all-pairs,
broadcast for small sides, map-side partial aggregation, no driver-side
loops over collected data.
"""

from spark_xml_spark.operators.dedup import (
    capped_collect,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    observed_drop_metrics,
    restore_aqe_conf,
    simhash,
    simhash_near_dup_pairs,
    connected_components,
    contamination_check,
    substring_dup_spans,
)
from spark_xml_spark.operators.similarity import (
    IvfIndex,
    LshIndex,
    brute_force_cosine_topk,
    cosine_pairs,
    lsh_bucketed_topk,
    normalize_quantize_int8,
)
from spark_xml_spark.operators.multimodal import (
    add_payload_metadata,
    default_audio_decoder,
    default_video_decoder,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_payload,
)
from spark_xml_spark.operators.textstats import (
    add_fingerprint,
    length_bucket_stats,
    train_val_test_split,
    unigram_logprob_score,
    vocab_topk,
    chunk_documents,
    deterministic_sample,
    deterministic_shuffle,
    mix_sample,
    add_language_id,
    add_quality_score,
    add_token_count,
    extract_url_domains,
    pack_sequences,
    pii_redact,
    repetition_metrics,
    corpus_profile,
)

__all__ = [
    "corpus_profile",
    "connected_components",
    "contamination_check",
    "substring_dup_spans",
    "capped_collect",
    "observed_drop_metrics",
    "restore_aqe_conf",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_near_dup_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "IvfIndex",
    "LshIndex",
    "brute_force_cosine_topk",
    "cosine_pairs",
    "lsh_bucketed_topk",
    "normalize_quantize_int8",
    "repetition_metrics",
    "pii_redact",
    "extract_url_domains",
    "add_token_count",
    "add_quality_score",
    "add_language_id",
    "add_fingerprint",
    "chunk_documents",
    "pack_sequences",
    "default_audio_decoder",
    "default_video_decoder",
    "deterministic_sample",
    "deterministic_shuffle",
    "length_bucket_stats",
    "mix_sample",
    "train_val_test_split",
    "unigram_logprob_score",
    "vocab_topk",
    "add_payload_metadata",
    "synthesize_payload",
    "extract_features",
    "resize_images",
    "sample_frames",
]
