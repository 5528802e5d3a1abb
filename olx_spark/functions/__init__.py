"""Column-level functions: URLs, fingerprints, text analysis, similarity."""
