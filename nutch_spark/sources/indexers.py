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

Network-backed writers (Solr/ES/Kafka) plug in by subclassing IndexWriter;
this container has no network, so the shipped writers are the filesystem
JSONL writer (the on-disk twin of a bulk-HTTP batch poster) and an in-memory
collector for tests.
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
