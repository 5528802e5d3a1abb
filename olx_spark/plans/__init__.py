"""Crawl driver loop + snapshot store."""
