"""Structured Streaming surface.

The reference has no stream operators (SURVEY.md §2.11) — its streaming
surfaces are CDC egress (worker/cdc.go) and poll-based GraphQL
subscriptions (graphql/subscription/poller.go). Here:

  - cdc:       snapshot-diff change feed + writeStream egress
  - windows:   watermarked tumbling/sliding/session aggregation over the
               events table (extension beyond the reference)
  - subscribe: foreachBatch re-evaluation of a DQL query (the
               subscription analogue)
"""

from dgraph_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = ["session_agg", "sliding_agg", "stream_events", "tumbling_agg"]
