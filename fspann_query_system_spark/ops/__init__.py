from .dedup import (exact_duplicates, dedup_exact, shingle_table,
                    minhash_signatures, minhash_band_pairs, jaccard_pairs,
                    winnow_fingerprints, near_dup_pipeline,
                    simhash, simhash_fast, simhash_near_pairs)
from .similarity import (cosine_topk, cosine_topk_sql_shape, ivf_topk,
                         embedding_near_dups, sq8_stats, sq8_quantize)
from .multimodal import (make_media_table, image_features, resize_images,
                         audio_features, frame_sample, media_summary)
from .skew import salted_agg, salted_join, explain_shuffles
from .quality import (decontaminate, bloom_decontaminate, dsir_weights,
                      gopher_filter, repetition_stats)
from .sampling import (stratified_sample, cluster_sample,
                       quality_curriculum, sample_to_budget)

__all__ = [
    "exact_duplicates", "dedup_exact", "shingle_table",
    "minhash_signatures", "minhash_band_pairs", "jaccard_pairs",
    "winnow_fingerprints", "near_dup_pipeline",
    "simhash", "simhash_fast", "simhash_near_pairs",
    "cosine_topk", "cosine_topk_sql_shape", "ivf_topk", "embedding_near_dups",
    "sq8_stats", "sq8_quantize",
    "make_media_table", "image_features", "resize_images", "audio_features",
    "frame_sample", "media_summary",
    "salted_agg", "salted_join", "explain_shuffles",
    "decontaminate", "bloom_decontaminate", "dsir_weights",
    "gopher_filter", "repetition_stats",
    "stratified_sample", "cluster_sample", "quality_curriculum",
    "sample_to_budget",
]
