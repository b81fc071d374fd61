"""Structured Streaming variants.

The crawl engine itself deliberately uses batch rounds + snapshot commits
instead of a continuous stream (SURVEY.md §2.6): the frontier is
self-produced, so there is no late data, and Iceberg-style snapshot-per-round
gives resumability more simply than streaming state stores. This package
holds the streaming-shaped operators the engine still exposes for event
telemetry (crawl metrics as a stream) and for users who feed the engine from
a live frontier feed.
"""
