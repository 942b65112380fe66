"""Large-scale training-data pipeline operators (beyond reference surface):
text analysis, deduplication, similarity search, multimodal plumbing."""
