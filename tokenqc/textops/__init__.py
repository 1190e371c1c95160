"""Training-data pipeline operators beyond the reference's QC gates:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (lang-ID, quality scoring, token counting, fingerprints),
and multimodal binary-column plumbing."""
