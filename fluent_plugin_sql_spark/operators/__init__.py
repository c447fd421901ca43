from .dedup import (  # noqa: F401
    embedding_dup_pairs,
    exact_dedup,
    jaccard_dup_pairs,
    minhash_lsh_dup_pairs,
    shingle_sets,
    simhash_dup_pairs,
)
from .cluster import (  # noqa: F401
    assign_two_level,
    kmeans_centroids,
    kmeans_cluster_profile,
    kmeans_embeddings,
    kmeans_large_embeddings,
    kmeans_parallel_centroids,
    semdedup_cap_stats,
    semdedup_prune,
)
from .native_codecs import native_image_decode, webp_available  # noqa: F401
from .similarity import brute_force_topk, cosine, hyperplane_buckets, lsh_topk  # noqa: F401
from .multimodal import (  # noqa: F401
    gif_frames,
    gif_pixels,
    jpeg_pixels,
    mjpeg_frame_spans,
    png_pixels,
    sample_video_frames,
    tiff_pixels,
    wav_pcm16_samples,
)
