"""Spatial-join operators — the distributed re-expression of the reference's
tree queries (SURVEY.md §2.2-2.4)."""
