"""DataFrame-level crawl operators (decision cascades, admission, frontier)."""
