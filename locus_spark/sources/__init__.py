"""Sources: testdata table loading, derived geometry views, synthetic
Common-Crawl-style pages, checkpointed stage storage."""
