"""Structured Streaming surface.

The reference has NO streaming subsystem (SURVEY.md §2.11): ingestion is
batch INSERT or bulk load; the only log-follower machinery is the Raft
listener feeding Elasticsearch (``src/kvstore/listener/``). This package is
the beyond-parity scale path: graph tables as streaming sinks, windowed
aggregation with watermarks, and custom stateful operators — the Spark-first
answer to "how do edges arrive continuously at 100 TB".
"""

from nebula_spark.streaming.ingest import (  # noqa: F401
    edge_stream_writer, sessionize, windowed_event_counts,
)
