"""publish-rabbitmq — fetcher progress events to a message queue.

Reference: src/java/org/apache/nutch/publisher/NutchPublisher.java (the
extension point), src/java/org/apache/nutch/fetcher/FetcherThreadEvent.java
(the payload: eventType START/END/REPORT, url, timestamp, eventData map) and
src/plugin/publish-rabbitmq/.../RabbitMQPublisherImpl.java (Jackson-JSON
body, static headers, exchange/routing key).

Spark shape: the reference publishes from inside FetcherThread; here the
unit of progress is the materialized fetch log, so ``publish_fetch_events``
streams one partition at a time through ``foreachPartition`` and emits the
same event sequence per URL — START (the fetch was dispatched), END (with
the CrawlDatum status name), REPORT (title/content-type/score when the row
carries them). Nothing collects to the driver; the publisher is constructed
ON the executor from a picklable factory, exactly like the index writers.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame


class RabbitMQPublisher:
    """RabbitMQPublisherImpl: one JSON message per event through the
    injected ``publish(exchange, routing_key, body_bytes, headers)``.
    For a live broker, ``sources/amqp_wire.amqp_publisher_factory`` builds
    a socket-level AMQP 0-9-1 client whose ``publish`` matches this
    signature (tested end-to-end in tests/test_amqp_wire.py)."""

    def __init__(
        self,
        publish: Callable[[str, str, bytes, dict], None],
        *,
        exchange: str = "fetcher_log",
        routing_key: str = "fetcher_log",
        headers_static: str = "",
    ) -> None:
        self.publish = publish
        self.exchange = exchange
        self.routing_key = routing_key
        self.headers = dict(
            kv.split("=", 1) for kv in headers_static.split(",") if "=" in kv
        )

    def send(self, event: dict) -> None:
        body = json.dumps(event, default=str, sort_keys=True).encode()
        self.publish(self.exchange, self.routing_key, body, dict(self.headers))


def fetcher_event(
    event_type: str, url: str, timestamp_ms: int, event_data: dict | None = None
) -> dict:
    """FetcherThreadEvent's Jackson rendering (fields by bean name)."""
    return {
        "eventType": event_type,
        "url": url,
        "timestamp": timestamp_ms,
        "eventData": event_data or {},
    }


def publish_fetch_events(
    fetch_log: DataFrame,
    publisher_factory: Callable[[], RabbitMQPublisher],
    *,
    url: str = "url",
    status: str = "status",
) -> None:
    """Emit START/END/REPORT per fetched URL (FetcherThread.java:354,437,
    848-853). REPORT carries the row's title / content_type / score when
    those columns exist — the same fields the reference attaches."""
    import time

    cols = [c for c in (url, status, "title", "content_type", "score") if c in fetch_log.columns]
    src = fetch_log.select(*cols)

    def run(rows) -> None:
        pub = publisher_factory()
        for row in rows:
            d = row.asDict()
            now = int(time.time() * 1000)
            u = d[url]
            pub.send(fetcher_event("START", u, now))
            pub.send(fetcher_event("END", u, now, {"status": d.get(status)}))
            report = {
                k: d[k]
                for k in ("title", "content_type", "score")
                if k in d and d[k] is not None
            }
            if report:
                pub.send(fetcher_event("REPORT", u, now, report))

    src.foreachPartition(run)
