"""Structured-Streaming variant of the crawl loop (optional path)."""
