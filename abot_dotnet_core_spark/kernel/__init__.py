"""Pure-Python semantic kernel — no Spark imports.

Single source of truth for URL normalization, hashing, robots.txt parsing,
HTML link/text extraction and crawl decisions. The Spark layer wraps these in
Arrow-batched pandas UDFs; the pytest oracle calls them directly, so both
sides are bit-identical by construction.
"""
