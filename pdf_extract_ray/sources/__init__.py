"""Input-format readers beyond parquet (WARC — the Common Crawl wire
format — first).  Every reader emits the canonical pages schema
(url: string, warc_ts: timestamp[us], html: binary) so the extraction
pipeline composes unchanged."""
