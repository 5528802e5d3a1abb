"""Crawl + relational operators (dedup, ranking, politeness, fetch, ANN)."""
