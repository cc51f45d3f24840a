"""Structured Streaming surface.

The reference is batch-only by design ("end-of-day batch processing
model", docs/intro_function.md:46) and lists "lack of streaming ability"
as a known disadvantage (:56).  SURVEY §2.9 maps its batch workarounds
to streaming constructs; this package provides them:

- tumbling-window aggregation (A1) as ``readStream`` + watermark —
  subsumes the batch ``day_covered`` cross-day completion (U1) and the
  same-day exclusion (P6): late rows within the watermark re-open their
  window instead of requiring a 3-day re-read;
- streaming ingest of the raw CSV drop directories (S1/S2/S3 as file
  streams);
- stateful per-sensor sessionization via ``applyInPandasWithState``.
"""

from atd_data_lake_spark.streaming.stateful import sessionize  # noqa: F401
from atd_data_lake_spark.streaming.windowed import (  # noqa: F401
    dedup_stream,
    interval_join_stream,
    sensor_obs_stream,
    stream_csv_source,
    tumbling_agg_stream,
)
