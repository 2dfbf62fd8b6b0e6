"""GraphQL-subscription analogue (reference:
graphql/subscription/poller.go — poll-based push of changed query
results). Structured Streaming version: re-evaluate a DQL query per
micro-batch of graph changes and invoke the callback only when the
result hash changes — exactly the poller's update-on-diff contract.
"""

from __future__ import annotations

import hashlib
import json
from typing import Callable

from dgraph_spark.model import Graph
from dgraph_spark.plans import Executor


def _result_hash(result: dict) -> str:
    return hashlib.sha256(
        json.dumps(result, sort_keys=True, default=str).encode()
    ).hexdigest()


class Subscription:
    """Holds the last-seen hash for one subscribed query
    (poller.go pollID/updates)."""

    def __init__(self, graph: Graph, query: str, on_update: Callable[[dict], None]):
        self.query = query
        self.on_update = on_update
        self.last_hash: str | None = None
        self.evaluate(graph)

    def evaluate(self, graph: Graph) -> bool:
        """Re-run the query; fire the callback when results changed.
        Returns True if an update fired."""
        result = Executor(graph).execute(self.query)
        h = _result_hash(result)
        if h != self.last_hash:
            self.last_hash = h
            self.on_update(result)
            return True
        return False


def subscribe_foreach_batch(
    base_graph_factory: Callable[[], Graph],
    subscriptions: list[Subscription],
):
    """foreachBatch hook: attach to a triples writeStream so every
    committed micro-batch re-polls the subscriptions::

        stream.writeStream.foreachBatch(
            subscribe_foreach_batch(lambda: load_graph(...), subs)
        ).start()
    """

    def hook(batch_df, batch_id):  # noqa: ANN001 - Spark callback shape
        g = base_graph_factory()
        for sub in subscriptions:
            sub.evaluate(g)

    return hook
