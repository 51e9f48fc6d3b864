"""Engine operators: mention detection, entity linking, canonicalization,
graph merge, dedup families, similarity search, stats, multimodal plumbing."""
