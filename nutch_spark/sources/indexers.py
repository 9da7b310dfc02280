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

Shipped writers — one per reference indexer plugin, each over an injected
transport so the container stays network-free while the wire format is
test-asserted (tests/test_index_writers.py):

- ``JsonlIndexWriter`` — filesystem twin of a bulk-HTTP poster
- ``EsBulkIndexWriter`` / ``OpenSearchBulkIndexWriter`` — exact ``_bulk``
  NDJSON framing (indexer-elastic, indexer-opensearch-1x)
- ``SolrIndexWriter`` — Solr JSON update API: batched adds/deletes,
  commit, basic/header auth (indexer-solr, the reference default)
- ``KafkaIndexWriter`` — per-doc messages + tombstone deletes
- ``RabbitIndexWriter`` — single/multiple commit modes, Gson-shaped
  message bodies (indexer-rabbit)
- ``CloudSearchIndexWriter`` — SHA-512 ids, cleaned field names, 5 MiB
  batch JSON arrays (indexer-cloudsearch)
- ``CsvIndexWriter`` — quoting/multivalue rules of indexer-csv
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


class IndexWriteError(RuntimeError):
    """A live sink rejected or failed a batch. Raised out of the executor's
    foreachPartition so Spark retries the task — the same failure semantics
    as the reference's SolrServerException path
    (SolrIndexWriter.java:233-248 wraps push failures into IOException)."""


def solr_http_transport(
    *, timeout: float = 30.0, max_retries: int = 2, backoff_s: float = 1.0
) -> Callable[[str, bytes, dict], None]:
    """The opt-in LIVE transport for :class:`SolrIndexWriter` — a stdlib
    urllib POST client (reference: SolrIndexWriter.java:163-248 opens a real
    HttpSolrClient; this is its javabin-free twin over the public JSON
    update API). Connection failures and 5xx retry ``max_retries`` times
    with linear backoff; 4xx fail immediately (a malformed document will
    not become valid by retrying). Picklable: constructed per-executor
    inside the writer factory closure."""

    def post(url: str, body: bytes, headers: dict) -> None:
        import time
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(
                    url, data=body, headers=headers, method="POST"
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    resp.read()
                return
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:
                    raise IndexWriteError(
                        f"solr update rejected ({e.code}): {e.read()[:500]!r}"
                    ) from e
                last = e
            except (urllib.error.URLError, OSError) as e:
                last = e
            if attempt < max_retries:
                time.sleep(backoff_s * (attempt + 1))
        raise IndexWriteError(f"solr update failed after retries: {last}") from last

    return post


def es_bulk_http_transport(
    base_url: str,
    *,
    headers: dict | None = None,
    timeout: float = 30.0,
    max_retries: int = 2,
    backoff_s: float = 1.0,
) -> Callable[[bytes], None]:
    """The opt-in LIVE transport for :class:`EsBulkIndexWriter` /
    :class:`OpenSearchBulkIndexWriter`: POST NDJSON bodies to
    ``<base_url>/_bulk`` with the documented ``application/x-ndjson``
    content type, then parse the response — Elasticsearch signals
    per-action failures with ``"errors": true`` inside an HTTP 200
    (ElasticIndexWriter.java's BulkProcessor listener checks
    ``response.hasFailures()``), so a 200 alone is NOT success.

    Delivery is AT-LEAST-ONCE: a 5xx/connection failure re-POSTs the whole
    ``_bulk`` body, so actions that partially applied server-side before the
    failure are re-applied. All writers in this module emit id-keyed
    ``index``/``delete`` actions (idempotent on replay — the reference's
    BulkProcessor retry behaves identically); do NOT hand this transport
    bodies whose correctness depends on delete-then-index ordering across
    retries, and treat per-action 409s on a retried batch as success."""
    hdrs = {"Content-Type": "application/x-ndjson", **(headers or {})}
    bulk_url = base_url.rstrip("/") + "/_bulk"

    def post(body: bytes) -> None:
        import time
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(
                    bulk_url, data=body, headers=dict(hdrs), method="POST"
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = resp.read()
                try:
                    parsed = json.loads(payload)
                except ValueError as e:
                    raise IndexWriteError(
                        f"unparseable _bulk response: {payload[:500]!r}"
                    ) from e
                if parsed.get("errors"):
                    failed = [
                        item
                        for item in parsed.get("items", [])
                        if next(iter(item.values()), {}).get("error")
                    ]
                    raise IndexWriteError(
                        f"_bulk reported {len(failed)} failed actions: "
                        f"{json.dumps(failed[:3])[:500]}"
                    )
                return
            except IndexWriteError:
                raise
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:
                    raise IndexWriteError(
                        f"_bulk rejected ({e.code}): {e.read()[:500]!r}"
                    ) from e
                last = e
            except (urllib.error.URLError, OSError) as e:
                last = e
            if attempt < max_retries:
                time.sleep(backoff_s * (attempt + 1))
        raise IndexWriteError(f"_bulk failed after retries: {last}") from last

    return post


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
        transport: Callable[[bytes], None] | None = None,
        *,
        live_url: str | None = None,
        index: str = "nutch",
        id_field: str = "url",
        max_bulk_docs: int = 250,
        max_bulk_bytes: int = 5 << 20,
    ) -> None:
        if transport is None:
            if not live_url:
                raise ValueError(
                    "EsBulkIndexWriter needs a transport: pass live_url=... "
                    "for the stdlib HTTP _bulk client or inject transport=..."
                )
            transport = es_bulk_http_transport(live_url)
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


def _iso_instant(dt) -> str:
    """java.time.DateTimeFormatter.ISO_INSTANT rendering: UTC, trailing Z,
    fractional seconds only when present (SolrIndexWriter.java:209-211)."""
    import datetime

    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        base += f".{dt.microsecond:06d}".rstrip("0")
    return base + "Z"


def strip_noncharacters(s: str) -> str:
    """SolrUtils.stripNonCharCodepoints (indexer-solr/.../SolrUtils.java:154):
    drop Unicode noncharacters (U+nFFFE/U+nFFFF every plane, U+FDD0-FDEF)
    and control chars other than tab/newline/carriage-return before a field
    reaches the index."""
    return "".join(
        ch
        for ch in s
        if ord(ch) % 0x10000 not in (0xFFFF, 0xFFFE)
        # U+FDD0..U+FDEF are noncharacters INCLUSIVE of both boundaries
        # (SolrUtils uses ch < 0xfdd0 || ch > 0xfdef)
        and (ord(ch) < 0xFDD0 or ord(ch) > 0xFDEF)
        and (ord(ch) > 0x1F or ord(ch) in (0x9, 0xA, 0xD))
    )


class SolrIndexWriter(IndexWriter):
    """Solr-shaped writer (src/plugin/indexer-solr/src/java/org/apache/nutch/
    indexwriter/solr/SolrIndexWriter.java) — the reference's DEFAULT sink.

    SolrJ's javabin transport is replaced by Solr's public JSON update API,
    framed exactly as documented: adds POST a JSON array of documents to
    ``<url>/update``, deletes POST ``{"delete": [ids...]}``, commit POSTs
    ``{"commit": {}}``. ``transport(url, body_bytes, headers)`` performs the
    POST — ``live=True`` wires the stdlib urllib client
    (:func:`solr_http_transport`); tests inject a capturing fake. All
    configured URLs receive every request (the reference fans out over its
    ``solrClients`` list, SolrIndexWriter.java:259-276).

    Mirrored semantics:

    - ``batch_size`` (solr ``commitSize``, default 1000): a push fires when
      buffered adds + deletes reach it (SolrIndexWriter.java:225-229)
    - ``delete`` gate: delete requests are ONLY buffered when the indexer's
      delete flag is on (IndexerMapReduce.INDEXER_DELETE)
    - date field values render as ISO_INSTANT strings; ``content`` and
      ``title`` pass through :func:`strip_noncharacters`
    - ``weight_field``: when set, each document gains that field from its
      ``weight`` value (doc.getWeight())
    - ``params`` (indexer.additional.params, "k=v&k2=v2"): appended to the
      update URL's query string
    - auth: a custom header pair outranks basic auth, which is sent as a
      standard ``Authorization: Basic`` header (SolrUtils.java builds the
      same via HttpClient interceptors)
    - the reference "escapes" '!' in delete ids with ``replaceAll("!",
      "\\\\!")`` — a Java replacement-string NO-OP (``\\!`` unescapes to a
      literal ``!``), so observable behavior is the unmodified key; we
      reproduce that observable behavior (SolrIndexWriter.java:179-181)
    """

    def __init__(
        self,
        transport: Callable[[str, bytes, dict], None] | None = None,
        *,
        live: bool = False,
        urls: list[str] | str,
        collection: str | None = None,
        batch_size: int = 1000,
        id_field: str = "url",
        delete: bool = False,
        weight_field: str = "",
        params: str | None = None,
        username: str | None = None,
        password: str | None = None,
        auth_header_name: str = "",
        auth_header_value: str = "",
    ) -> None:
        if not urls:
            raise ValueError("Missing SOLR URL")  # SolrIndexWriter.java:96-99
        if transport is None:
            if not live:
                raise ValueError(
                    "SolrIndexWriter needs a transport: pass live=True for "
                    "the stdlib HTTP client or inject transport=..."
                )
            transport = solr_http_transport()
        self.transport = transport
        self.urls = [urls] if isinstance(urls, str) else list(urls)
        self.collection = collection
        self.batch_size = batch_size
        self.id_field = id_field
        self.delete_enabled = delete
        self.weight_field = weight_field
        # indexer.additional.params: "k=v&k2=v2"; fragments without '='
        # are skipped, as in init()'s kv.length < 2 guard
        good = [
            kv.split("=", 1) for kv in (params or "").split("&") if "=" in kv
        ]
        self.query = "?" + "&".join(f"{k}={v}" for k, v in good) if good else ""
        self.headers = {"Content-Type": "application/json"}
        if auth_header_name and auth_header_value:
            self.headers[auth_header_name] = auth_header_value
        elif username and password:
            import base64

            cred = base64.b64encode(f"{username}:{password}".encode()).decode()
            self.headers["Authorization"] = f"Basic {cred}"
        self._adds: list[dict] = []
        self._deletes: list[str] = []

    def _update_url(self, base: str) -> str:
        path = base.rstrip("/")
        if self.collection:
            path += "/" + self.collection
        return path + "/update" + self.query

    def _post(self, body) -> None:
        data = json.dumps(body, default=str, sort_keys=True).encode()
        for base in self.urls:
            self.transport(self._update_url(base), data, dict(self.headers))

    def _normalize(self, doc: dict) -> dict:
        import datetime

        out = {}
        for k, v in doc.items():
            vals = v if isinstance(v, (list, tuple)) else [v]
            norm = []
            for val in vals:
                if isinstance(val, datetime.datetime):
                    val = _iso_instant(val)
                elif isinstance(val, datetime.date):
                    val = _iso_instant(
                        datetime.datetime(val.year, val.month, val.day)
                    )
                if k in ("content", "title") and isinstance(val, str):
                    val = strip_noncharacters(val)
                norm.append(val)
            out[k] = norm if isinstance(v, (list, tuple)) else norm[0]
        if self.weight_field and "weight" in doc:
            out[self.weight_field] = doc["weight"]
        return out

    def _maybe_push(self) -> None:
        if len(self._adds) + len(self._deletes) >= self.batch_size:
            self._push()

    def write(self, docs: list[dict]) -> None:
        for doc in docs:
            self._adds.append(self._normalize(doc))
            self._maybe_push()

    def delete(self, ids: list[str]) -> None:
        if not self.delete_enabled:
            return
        for i in ids:
            self._deletes.append(str(i))
            self._maybe_push()

    def _push(self) -> None:
        if self._adds:
            self._post(self._adds)
            self._adds = []
        if self._deletes:
            self._post({"delete": self._deletes})
            self._deletes = []

    def commit(self) -> None:
        self._push()
        self._post({"commit": {}})


class OpenSearchBulkIndexWriter(EsBulkIndexWriter):
    """OpenSearch writer (src/plugin/indexer-opensearch-1x/.../
    OpenSearchIndexWriter.java): OpenSearch 1.x speaks the identical public
    ``_bulk`` NDJSON protocol as Elasticsearch — same framing, same
    maxBulkDocs/maxBulkLength buffering — so the writer is the ES writer
    with an OpenSearch endpoint. Kept as a distinct registered type to
    mirror the reference's separate plugin id."""


class RabbitIndexWriter(IndexWriter):
    """RabbitMQ-shaped writer (src/plugin/indexer-rabbit/.../
    RabbitIndexWriter.java). ``publish(exchange, routing_key, body_bytes,
    headers)`` is injected — production binds a pika channel; tests capture.

    Mirrored semantics:

    - buffers adds + deletes; a COMMIT fires when the combined buffer
      reaches ``commit_size`` (default 250, RabbitIndexWriter.java:95,136)
    - ``commit_mode="multiple"`` (default): ONE message whose body is the
      whole buffered message JSON — ``{"docsToWrite": [...],
      "docsToUpdate": [...], "docsToDelete": [urls]}`` with each document
      as ``{"fields": [{"key", "weight", "values"}], "documentBoost"}``,
      the exact Gson rendering of RabbitMessage/RabbitDocument
    - ``commit_mode="single"``: one message per action — deletes first
      (body = url bytes, header action=delete), then writes (body =
      document JSON, header action=write), RabbitIndexWriter.java:171-204
    - static headers (k=v,k2=v2) ride on every message
    """

    def __init__(
        self,
        publish: Callable[[str, str, bytes, dict], None],
        *,
        exchange: str = "nutch.exchange",
        routing_key: str = "nutch.key",
        commit_size: int = 250,
        commit_mode: str = "multiple",
        headers_static: str = "",
        id_field: str = "url",
    ) -> None:
        self.publish = publish
        self.exchange = exchange
        self.routing_key = routing_key
        self.commit_size = commit_size
        self.commit_mode = commit_mode
        self.id_field = id_field
        self.headers = dict(
            kv.split("=", 1) for kv in headers_static.split(",") if "=" in kv
        )
        self._writes: list[dict] = []
        self._deletes: list[str] = []

    @staticmethod
    def _rabbit_doc(doc: dict) -> dict:
        fields = [
            {
                "key": k,
                "weight": 1.0,
                "values": v if isinstance(v, (list, tuple)) else [v],
            }
            for k, v in doc.items()
        ]
        return {"fields": fields, "documentBoost": float(doc.get("weight", 1.0))}

    def _size(self) -> int:
        return len(self._writes) + len(self._deletes)

    def write(self, docs: list[dict]) -> None:
        for doc in docs:
            self._writes.append(self._rabbit_doc(doc))
            if self._size() >= self.commit_size:
                self.commit()

    def delete(self, ids: list[str]) -> None:
        for i in ids:
            self._deletes.append(str(i))
            if self._size() >= self.commit_size:
                self.commit()

    def commit(self) -> None:
        if not self._size():
            return
        if self.commit_mode == "single":
            for url in self._deletes:
                self.publish(
                    self.exchange,
                    self.routing_key,
                    url.encode(),
                    {**self.headers, "action": "delete"},
                )
            for doc in self._writes:
                self.publish(
                    self.exchange,
                    self.routing_key,
                    json.dumps(doc, default=str).encode(),
                    {**self.headers, "action": "write"},
                )
        else:
            body = {
                "docsToWrite": self._writes,
                "docsToUpdate": [],
                "docsToDelete": self._deletes,
            }
            self.publish(
                self.exchange,
                self.routing_key,
                json.dumps(body, default=str).encode(),
                dict(self.headers),
            )
        self._writes, self._deletes = [], []


def cloudsearch_http_transport(
    endpoint_url: str,
    *,
    headers: dict | None = None,
    timeout: float = 30.0,
    max_retries: int = 2,
    backoff_s: float = 1.0,
) -> Callable[[bytes], None]:
    """The opt-in LIVE transport for :class:`CloudSearchIndexWriter`: POST
    SDF batch JSON to the domain's public batch endpoint
    ``<endpoint>/2013-01-01/documents/batch`` with ``application/json``
    (the documented CloudSearch document-service API the reference reaches
    through AmazonCloudSearchDomainClient.uploadDocuments,
    CloudSearchIndexWriter.java:296-330). CloudSearch reports per-document
    failures as ``"status": "error"`` + an ``errors`` array inside an HTTP
    200, so a 200 alone is NOT success. 5xx/connection failures re-POST the
    whole batch (at-least-once; adds/deletes are id-keyed and idempotent on
    replay); 4xx and in-body errors fail immediately."""
    import json as _json

    hdrs = {"Content-Type": "application/json", **(headers or {})}
    url = endpoint_url.rstrip("/")
    if not url.endswith("/documents/batch"):
        url += "/2013-01-01/documents/batch"

    def upload(body: bytes) -> None:
        import time
        import urllib.error
        import urllib.request

        last: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(
                    url, data=body, headers=dict(hdrs), method="POST"
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = resp.read()
                try:
                    doc = _json.loads(payload.decode("utf-8", errors="replace"))
                except ValueError:
                    doc = {}
                if doc.get("status") == "error" or doc.get("errors"):
                    raise IndexWriteError(
                        f"cloudsearch batch rejected: {payload[:500]!r}"
                    )
                return
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:
                    raise IndexWriteError(
                        f"cloudsearch batch rejected ({e.code}): "
                        f"{e.read()[:500]!r}"
                    ) from e
                last = e
            except (urllib.error.URLError, OSError) as e:
                last = e
            if attempt < max_retries:
                time.sleep(backoff_s * (attempt + 1))
        raise IndexWriteError(
            f"cloudsearch batch failed after retries: {last}"
        ) from last

    return upload


class CloudSearchIndexWriter(IndexWriter):
    """AWS CloudSearch-shaped writer (src/plugin/indexer-cloudsearch/.../
    CloudSearchIndexWriter.java): document-batch JSON arrays POSTed through
    ``upload(body_bytes)`` — ``live_url=`` wires the stdlib urllib client
    (:func:`cloudsearch_http_transport`, the domain's public
    ``documents/batch`` endpoint); tests inject a capturing fake.

    Mirrored semantics (CloudSearchIndexWriter.java:167-330):

    - document id = hex SHA-512 of the url (CloudSearchUtils.getID)
    - batch entries are ``{"type": "add", "id": ..., "fields": {...}}`` /
      ``{"type": "delete", "id": ...}``
    - field names lower-case with ``[^a-z_0-9]`` → ``_`` (cleanFieldName);
      string values pass stripNonCharCodepoints; dates render as
      ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'``
    - a single doc larger than ``MAX_SIZE_DOC_BYTES`` (1 MiB) is SKIPPED
      with an error, never shipped; the batch flushes when adding a doc
      would cross ``MAX_SIZE_BATCH_BYTES`` (5 MiB) or when
      ``max_docs_in_batch`` is reached
    """

    MAX_SIZE_BATCH_BYTES = 5242880
    MAX_SIZE_DOC_BYTES = 1048576

    def __init__(
        self,
        upload: Callable[[bytes], None] | None = None,
        *,
        live_url: str | None = None,
        max_docs_in_batch: int = -1,
        id_field: str = "url",
    ) -> None:
        if upload is None:
            if not live_url:
                raise ValueError(
                    "CloudSearchIndexWriter needs a transport: pass "
                    "live_url=<doc endpoint> for the stdlib HTTP client "
                    "or inject upload=..."
                )
            upload = cloudsearch_http_transport(live_url)
        self.upload = upload
        self.max_docs_in_batch = max_docs_in_batch
        self.id_field = id_field
        self._entries: list[bytes] = []
        self._nbytes = 1  # the opening '['

    @staticmethod
    def doc_id(url: str) -> str:
        import hashlib

        return hashlib.sha512(url.encode()).hexdigest()

    @staticmethod
    def clean_field_name(name: str) -> str:
        import re

        return re.sub(r"[^a-z_0-9]", "_", name.lower())

    def _add_to_batch(self, entry: dict) -> None:
        blob = json.dumps(entry, default=str, sort_keys=True, indent=2).encode()
        if len(blob) > self.MAX_SIZE_DOC_BYTES:
            return  # doc too large: logged and skipped in the reference
        if len(blob) + 2 + self._nbytes >= self.MAX_SIZE_BATCH_BYTES:
            self.commit()
        self._entries.append(blob)
        self._nbytes += len(blob) + 1
        if 0 < self.max_docs_in_batch == len(self._entries):
            self.commit()

    def write(self, docs: list[dict]) -> None:
        import datetime

        for doc in docs:
            url = str(doc.get(self.id_field))
            fields: dict = {}
            for k, v in doc.items():
                name = self.clean_field_name(k)
                for val in v if isinstance(v, (list, tuple)) else [v]:
                    if isinstance(val, datetime.datetime):
                        val = (
                            val.strftime("%Y-%m-%dT%H:%M:%S.")
                            + f"{val.microsecond // 1000:03d}Z"
                        )
                    elif isinstance(val, str):
                        val = strip_noncharacters(val)
                    if name in fields:  # JSONObject.accumulate semantics
                        prev = fields[name]
                        fields[name] = (
                            prev + [val] if isinstance(prev, list) else [prev, val]
                        )
                    else:
                        fields[name] = val
            self._add_to_batch(
                {"type": "add", "id": self.doc_id(url), "fields": fields}
            )

    def delete(self, ids: list[str]) -> None:
        for i in ids:
            self._add_to_batch({"type": "delete", "id": self.doc_id(str(i))})

    def commit(self) -> None:
        if not self._entries:
            return
        self.upload(b"[" + b",".join(self._entries) + b"]")
        self._entries, self._nbytes = [], 1


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
