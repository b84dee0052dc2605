"""Large-scale training-data operations beyond the reference's surface:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), approximate similarity search, text analysis
(language id, quality scoring, token counting, fingerprinting),
sequence layout (chunking / cross-doc packing), exact grouped
quantiles, deterministic sampling/splits and multimodal column
plumbing — all Ray-Data-first."""
