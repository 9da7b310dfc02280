"""S6 — the IndexWriter protocol: batched ADD/DELETE delivery to external
search backends.

Reference: indexer/IndexWriters.java (plugin registry + fan-out),
indexer/IndexWriter.java (open/write/delete/commit/close lifecycle),
src/plugin/indexer-solr/.../SolrIndexWriter.java (batchSize buffering),
src/plugin/exchange-jexl (per-writer JEXL routing expressions).

Spark shape: ``index_documents`` runs one ``foreachPartition`` per writer —
the writer object is constructed ON THE EXECUTOR (factories are pickled,
not live connections), documents are buffered to ``batch_size`` and flushed,
``commit`` fires once per partition. Nothing ever collects to the driver;
backpressure is the executor's own iteration speed, exactly how the
reference's IndexerOutputFormat streams reducer output into writers.

Shipped writers: the filesystem JSONL writer (on-disk twin of a bulk-HTTP
poster), ``EsBulkIndexWriter`` (exact Elasticsearch ``_bulk`` NDJSON framing
over an injected transport — swap in an HTTP POST for production), and
``KafkaIndexWriter`` (per-doc messages + tombstone deletes over an injected
producer factory). The injected transports keep this container network-free
while the wire formats stay test-asserted (tests/test_index_writers.py).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.functions.jexl import jexl_to_sql


class IndexWriter:
    """Executor-side writer lifecycle (indexer/IndexWriter.java)."""

    def open(self, partition_id: int) -> None:  # noqa: B027
        """Called once per partition before any batch."""

    def write(self, docs: list[dict]) -> None:
        raise NotImplementedError

    def delete(self, ids: list[str]) -> None:
        raise NotImplementedError

    def commit(self) -> None:  # noqa: B027
        """Called once per partition after the last batch."""


class JsonlIndexWriter(IndexWriter):
    """Filesystem stand-in for a bulk-HTTP backend: each commit writes the
    partition's buffered actions as one JSONL file (one bulk request)."""

    def __init__(self, directory: str, id_field: str = "url") -> None:
        self.directory = directory
        self.id_field = id_field
        self._adds: list[dict] = []
        self._deletes: list[str] = []

    def open(self, partition_id: int) -> None:
        os.makedirs(self.directory, exist_ok=True)
        self._pid = partition_id

    def write(self, docs: list[dict]) -> None:
        self._adds.extend(docs)

    def delete(self, ids: list[str]) -> None:
        self._deletes.extend(ids)

    def commit(self) -> None:
        if not self._adds and not self._deletes:
            return
        path = os.path.join(
            self.directory, f"bulk-{self._pid}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        with open(path, "w") as f:
            for doc in self._adds:
                f.write(json.dumps({"action": "add", "doc": doc}, default=str) + "\n")
            for i in self._deletes:
                f.write(json.dumps({"action": "delete", "id": i}) + "\n")
        self._adds, self._deletes = [], []


class EsBulkIndexWriter(IndexWriter):
    """Elasticsearch-bulk-shaped writer
    (src/plugin/indexer-elastic/src/java/org/apache/nutch/indexwriter/
    elastic/ElasticIndexWriter.java): buffers actions and ships them as
    ``_bulk`` NDJSON bodies through ``transport`` — in production an HTTP
    POST to ``/_bulk``; in tests a capturing fake. Framing follows the
    public ES bulk API exactly:

        {"index": {"_index": <index>, "_id": <id>}}\\n<source-json>\\n
        {"delete": {"_index": <index>, "_id": <id>}}\\n

    Buffering mirrors the reference's maxBulkDocs / maxBulkLength knobs:
    a body is flushed when either the action count or the byte length
    crosses its cap; ``commit`` flushes the remainder. The transport
    callable must be picklable (it rides to the executor inside the
    writer factory closure).
    """

    def __init__(
        self,
        transport: Callable[[bytes], None],
        *,
        index: str = "nutch",
        id_field: str = "url",
        max_bulk_docs: int = 250,
        max_bulk_bytes: int = 5 << 20,
    ) -> None:
        self.transport = transport
        self.index = index
        self.id_field = id_field
        self.max_bulk_docs = max_bulk_docs
        self.max_bulk_bytes = max_bulk_bytes
        self._lines: list[bytes] = []
        self._ndocs = 0
        self._nbytes = 0

    def _push(self, *lines: bytes) -> None:
        for ln in lines:
            self._lines.append(ln)
            self._nbytes += len(ln) + 1
        self._ndocs += 1
        if self._ndocs >= self.max_bulk_docs or self._nbytes >= self.max_bulk_bytes:
            self._flush()

    def _flush(self) -> None:
        if not self._lines:
            return
        body = b"\n".join(self._lines) + b"\n"  # bulk bodies are \n-terminated
        self.transport(body)
        self._lines, self._ndocs, self._nbytes = [], 0, 0

    def write(self, docs: list[dict]) -> None:
        for doc in docs:
            action = {"index": {"_index": self.index, "_id": doc.get(self.id_field)}}
            self._push(
                json.dumps(action, sort_keys=True).encode(),
                json.dumps(doc, default=str, sort_keys=True).encode(),
            )

    def delete(self, ids: list[str]) -> None:
        for i in ids:
            self._push(
                json.dumps(
                    {"delete": {"_index": self.index, "_id": i}}, sort_keys=True
                ).encode()
            )

    def commit(self) -> None:
        self._flush()


class CsvIndexWriter(IndexWriter):
    """CSV-shaped writer (src/plugin/indexer-csv/src/java/org/apache/nutch/
    indexwriter/csv/CSVIndexWriter.java): an ordered field list becomes the
    column set; fields containing the separator, quote, or a newline are
    quoted, quotes escape by doubling; multi-valued fields join on
    ``value_sep`` (reference: no escape inside a value separator). One file
    per partition via the injected ``opener`` (csv.fields / csv.separator /
    csv.quotechar knobs)."""

    def __init__(
        self,
        directory: str,
        fields: list[str],
        *,
        sep: str = ",",
        quote: str = '"',
        value_sep: str = "|",
        header: bool = True,
    ) -> None:
        self.directory = directory
        self.fields = list(fields)
        self.sep = sep
        self.quote = quote
        self.value_sep = value_sep
        self.header = header
        self._rows: list[str] = []

    def open(self, partition_id: int) -> None:
        os.makedirs(self.directory, exist_ok=True)
        self._pid = partition_id

    def _cell(self, v) -> str:
        if v is None:
            return ""
        if isinstance(v, (list, tuple)):
            v = self.value_sep.join(str(x) for x in v)
        s = str(v)
        if self.sep in s or self.quote in s or "\n" in s or "\r" in s:
            s = self.quote + s.replace(self.quote, self.quote * 2) + self.quote
        return s

    def write(self, docs: list[dict]) -> None:
        for doc in docs:
            self._rows.append(self.sep.join(self._cell(doc.get(f)) for f in self.fields))

    def delete(self, ids: list[str]) -> None:
        # CSVIndexWriter.delete is a documented no-op (a flat file cannot
        # delete); the reference logs and drops — same here
        return

    def commit(self) -> None:
        if not self._rows:
            return
        path = os.path.join(
            self.directory, f"part-{self._pid}-{uuid.uuid4().hex[:8]}.csv"
        )
        with open(path, "w") as f:
            if self.header:
                f.write(self.sep.join(self.fields) + "\n")
            f.write("\n".join(self._rows) + "\n")
        self._rows = []


class KafkaIndexWriter(IndexWriter):
    """Kafka-shaped writer (src/plugin/indexer-kafka/src/java/org/apache/
    nutch/indexwriter/kafka/KafkaIndexWriter.java): one message per document
    on ``topic`` — key is the document id, value is the JSON document —
    and deletes are TOMBSTONES (value=None), the idiomatic Kafka delete for
    a log-compacted index topic. ``producer_factory`` builds the producer on
    the executor (a live client must never be pickled); it needs
    ``send(topic, key: bytes, value: bytes | None)`` and ``flush()``, the
    subset of the kafka-python Producer surface the reference uses.
    ``commit`` flushes, so a partition's messages are durable before the
    task reports success."""

    def __init__(
        self,
        producer_factory: Callable[[], object],
        *,
        topic: str = "nutch",
        id_field: str = "url",
    ) -> None:
        self.producer_factory = producer_factory
        self.topic = topic
        self.id_field = id_field
        self._producer = None

    def open(self, partition_id: int) -> None:
        self._producer = self.producer_factory()

    def write(self, docs: list[dict]) -> None:
        for doc in docs:
            key = str(doc.get(self.id_field)).encode()
            self._producer.send(
                self.topic, key, json.dumps(doc, default=str, sort_keys=True).encode()
            )

    def delete(self, ids: list[str]) -> None:
        for i in ids:
            self._producer.send(self.topic, str(i).encode(), None)

    def commit(self) -> None:
        if self._producer is not None:
            self._producer.flush()


def index_documents(
    docs: DataFrame,
    writers: dict[str, Callable[[], IndexWriter]],
    *,
    exchanges: dict[str, str] | None = None,
    action_col: str = "action",
    id_field: str = "url",
    batch_size: int = 250,
) -> None:
    """Deliver ADD/DELETE actions to every registered writer.

    ``writers`` maps sink name → zero-arg factory (constructed per
    partition on the executor). ``exchanges`` optionally maps sink name →
    JEXL expression (src/plugin/exchange-jexl) selecting which documents
    that sink receives; sinks without an expression get everything.
    SKIP-action rows are dropped (IndexerMapReduce notmodified skip).
    """
    exchanges = exchanges or {}
    routed = docs.filter(F.col(action_col) != "SKIP")
    for name, factory in writers.items():
        sink_df = routed
        expr = exchanges.get(name)
        if expr:
            sink_df = sink_df.filter(F.expr(jexl_to_sql(expr)))

        def run(rows: Iterator, factory=factory) -> None:
            from pyspark import TaskContext

            writer = factory()
            writer.open(TaskContext.get().partitionId())
            adds: list[dict] = []
            deletes: list[str] = []
            for row in rows:
                d = row.asDict(recursive=True)
                if d.get(action_col) == "DELETE":
                    deletes.append(d.get(id_field))
                else:
                    adds.append(d)
                if len(adds) >= batch_size:
                    writer.write(adds)
                    adds = []
                if len(deletes) >= batch_size:
                    writer.delete(deletes)
                    deletes = []
            if adds:
                writer.write(adds)
            if deletes:
                writer.delete(deletes)
            writer.commit()

        sink_df.foreachPartition(run)
