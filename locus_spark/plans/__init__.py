"""Engine planners: spatial rewrites happen here, at DataFrame-construction
time — Catalyst then sees plain equi-joins + predicates it already knows how
to optimize (SURVEY.md §4: no custom Catalyst rule needed, by design)."""
