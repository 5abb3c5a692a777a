"""Structured-Streaming surface.

The reference is fully batch (SURVEY.md §2.6 — no streaming semantics), so
streaming here covers the engine-side ingestion story: the same hourly rollup
as the batch query ``events_hourly`` expressed over a streaming source with a
watermark for late data.  Tested with ``trigger(availableNow=True)`` against
the batch plan's result.
"""

from locus_spark.streaming.windowed import (  # noqa: F401
    hourly_event_stream,
    trending_props_stream,
)
