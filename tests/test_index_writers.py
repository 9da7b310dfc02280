"""ES-bulk- and Kafka-shaped IndexWriter protocol tests (round-4 item 5).

The backends are faked, the WIRE FORMAT is not: the ES fake captures every
``_bulk`` body the writer posts and the tests re-parse the NDJSON framing
exactly as Elasticsearch would; the Kafka fake records (topic, key, value)
messages and the tests assert JSON values and tombstone deletes. Fakes
persist through the shared filesystem because foreachPartition runs in
executor worker processes (reference protocol surface:
src/plugin/indexer-elastic ElasticIndexWriter.java,
src/plugin/indexer-kafka KafkaIndexWriter.java).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from nutch_spark.sources.indexers import (
    EsBulkIndexWriter,
    KafkaIndexWriter,
    index_documents,
)

DOCS = [
    ("http://a.com/1", "ADD", "text/html", "t1"),
    ("http://a.com/2", "DELETE", "text/html", None),
    ("http://a.com/3", "SKIP", "text/html", "t3"),
    ("http://b.com/1", "ADD", "application/pdf", "t4"),
    ("http://b.com/2", "ADD", "text/html", "t5"),
]
SCHEMA = "url string, action string, type string, title string"


def _parse_bulk(body: bytes) -> list[tuple[str, str, dict | None]]:
    """Re-parse a _bulk NDJSON body the way ES does: an ``index`` action line
    is followed by its source line; ``delete`` stands alone."""
    assert body.endswith(b"\n"), "bulk bodies must be newline-terminated"
    lines = body.decode().splitlines()
    out, i = [], 0
    while i < len(lines):
        action = json.loads(lines[i])
        (verb, meta), = action.items()
        assert verb in ("index", "delete"), f"unknown bulk verb {verb}"
        if verb == "index":
            out.append((verb, meta["_id"], json.loads(lines[i + 1])))
            i += 2
        else:
            out.append((verb, meta["_id"], None))
            i += 1
    return out


def test_es_bulk_framing_and_routing(spark, tmp_path):
    cap = str(tmp_path / "bulks")
    os.makedirs(cap)

    def transport(body: bytes) -> None:
        with open(os.path.join(cap, f"bulk-{uuid.uuid4().hex}.ndjson"), "wb") as f:
            f.write(body)

    docs = spark.createDataFrame(DOCS, SCHEMA).coalesce(1)
    index_documents(
        docs,
        {"es": lambda: EsBulkIndexWriter(transport, index="pages")},
        exchanges={"es": "type == 'text/html'"},
    )

    actions = []
    for p in glob.glob(cap + "/*.ndjson"):
        actions += _parse_bulk(open(p, "rb").read())

    adds = {i: src for verb, i, src in actions if verb == "index"}
    dels = {i for verb, i, _ in actions if verb == "delete"}
    # SKIP dropped, pdf routed away by the exchange, DELETE as delete action
    assert set(adds) == {"http://a.com/1", "http://b.com/2"}
    assert dels == {"http://a.com/2"}
    assert adds["http://a.com/1"]["title"] == "t1"  # full source doc shipped


def test_es_bulk_max_docs_splits_bodies(spark, tmp_path):
    cap = str(tmp_path / "bulks")
    os.makedirs(cap)

    def transport(body: bytes) -> None:
        with open(os.path.join(cap, f"bulk-{uuid.uuid4().hex}.ndjson"), "wb") as f:
            f.write(body)

    docs = spark.createDataFrame(
        [(f"http://h.com/{i}", "ADD", "text/html", f"t{i}") for i in range(10)],
        SCHEMA,
    ).coalesce(1)
    index_documents(
        docs,
        {"es": lambda: EsBulkIndexWriter(transport, max_bulk_docs=4)},
    )
    bodies = [open(p, "rb").read() for p in glob.glob(cap + "/*.ndjson")]
    sizes = sorted(len(_parse_bulk(b)) for b in bodies)
    assert sizes == [2, 4, 4]  # 10 docs -> 4+4+2, remainder on commit
    all_ids = {i for b in bodies for _, i, _ in _parse_bulk(b)}
    assert len(all_ids) == 10


def test_kafka_messages_and_tombstones(spark, tmp_path):
    cap = str(tmp_path / "msgs")
    os.makedirs(cap)

    class FileProducer:
        """kafka-python-shaped fake: records sends, marks flush."""

        def __init__(self, directory: str) -> None:
            self.directory = directory
            self._msgs: list[dict] = []

        def send(self, topic: str, key: bytes, value: bytes | None) -> None:
            self._msgs.append(
                {
                    "topic": topic,
                    "key": key.decode(),
                    "value": value.decode() if value is not None else None,
                }
            )

        def flush(self) -> None:
            p = os.path.join(self.directory, f"p-{uuid.uuid4().hex}.jsonl")
            with open(p, "w") as f:
                for m in self._msgs:
                    f.write(json.dumps(m) + "\n")

    docs = spark.createDataFrame(DOCS, SCHEMA).coalesce(1)
    index_documents(
        docs,
        {"kafka": lambda: KafkaIndexWriter(lambda: FileProducer(cap), topic="idx")},
    )

    msgs = []
    for p in glob.glob(cap + "/*.jsonl"):
        msgs += [json.loads(l) for l in open(p)]
    assert all(m["topic"] == "idx" for m in msgs)
    by_key = {m["key"]: m["value"] for m in msgs}
    # ADDs carry the JSON doc, DELETE is a tombstone (value None), SKIP absent
    assert set(by_key) == {
        "http://a.com/1",
        "http://a.com/2",
        "http://b.com/1",
        "http://b.com/2",
    }
    assert by_key["http://a.com/2"] is None
    assert json.loads(by_key["http://b.com/1"])["type"] == "application/pdf"


def test_kafka_flush_only_on_commit(spark, tmp_path):
    # nothing hits the log until commit(): flush is the durability barrier
    cap = str(tmp_path / "m2")
    os.makedirs(cap)
    w = KafkaIndexWriter(lambda: _ListProducer(cap), topic="t")
    w.open(0)
    w.write([{"url": "u1"}])
    assert glob.glob(cap + "/*.jsonl") == []
    w.commit()
    assert len(glob.glob(cap + "/*.jsonl")) == 1


class _ListProducer:
    def __init__(self, directory: str) -> None:
        self.directory = directory
        self._msgs: list[tuple] = []

    def send(self, topic, key, value):
        self._msgs.append((topic, key, value))

    def flush(self):
        with open(os.path.join(self.directory, f"{uuid.uuid4().hex}.jsonl"), "w") as f:
            for m in self._msgs:
                f.write(repr(m) + "\n")


def test_csv_index_writer_quoting_and_multivalue(spark, tmp_path):
    from nutch_spark.sources.indexers import CsvIndexWriter

    out = str(tmp_path / "csv")
    docs = spark.createDataFrame(
        [
            ("http://a.com/1", "ADD", 'says "hi", twice', "t1"),
            ("http://a.com/2", "ADD", "line\nbreak", "t2"),
            ("http://a.com/3", "DELETE", None, None),  # no-op for CSV
            ("http://a.com/4", "ADD", "plain", "t4"),
        ],
        SCHEMA.replace("type string", "body string"),
    ).coalesce(1)
    index_documents(
        docs,
        {"csv": lambda: CsvIndexWriter(out, ["url", "body", "title"])},
    )
    files = glob.glob(out + "/*.csv")
    assert len(files) == 1
    lines = open(files[0]).read().splitlines()
    assert lines[0] == "url,body,title"
    body = "\n".join(lines[1:])
    # embedded quotes double, separators/newlines force quoting
    assert '"says ""hi"", twice"' in body
    assert '"line\nbreak"' in body
    assert "http://a.com/4,plain,t4" in body
    assert "a.com/3" not in body  # deletes are a documented no-op


def test_csv_index_writer_value_separator(tmp_path):
    from nutch_spark.sources.indexers import CsvIndexWriter

    w = CsvIndexWriter(str(tmp_path), ["url", "tags"], value_sep="|", header=False)
    w.open(0)
    w.write([{"url": "http://a.com/", "tags": ["x", "y", "z"]}])
    w.commit()
    (f,) = glob.glob(str(tmp_path) + "/*.csv")
    assert open(f).read() == "http://a.com/,x|y|z\n"


# --- Solr (indexer-solr/.../SolrIndexWriter.java) ---------------------------


def _solr_capture(directory: str):
    """Capturing transport closure (cloudpickle ships it by value to the
    executor): records (url, parsed-body, headers) to a spool directory."""

    def transport(url: str, body: bytes, headers: dict) -> None:
        os.makedirs(directory, exist_ok=True)
        rec = {"url": url, "body": json.loads(body), "headers": headers}
        with open(os.path.join(directory, uuid.uuid4().hex + ".json"), "w") as f:
            json.dump(rec, f)

    return transport


def _solr_posts(directory: str) -> list[dict]:
    return [json.load(open(p)) for p in glob.glob(directory + "/*.json")]


def test_solr_json_update_framing(spark, tmp_path):
    from nutch_spark.sources.indexers import SolrIndexWriter

    cap = str(tmp_path / "solr")

    def transport(url: str, body: bytes, headers: dict) -> None:
        os.makedirs(cap, exist_ok=True)
        rec = {"url": url, "body": json.loads(body), "headers": headers}
        with open(os.path.join(cap, uuid.uuid4().hex + ".json"), "w") as f:
            json.dump(rec, f)

    docs = spark.createDataFrame(DOCS, SCHEMA).coalesce(1)
    index_documents(
        docs,
        {
            "solr": lambda: SolrIndexWriter(
                transport, urls="http://solr:8983/solr/nutch", delete=True
            )
        },
    )
    posts = _solr_posts(cap)
    adds = [p for p in posts if isinstance(p["body"], list)]
    dels = [p for p in posts if isinstance(p["body"], dict) and "delete" in p["body"]]
    commits = [p for p in posts if isinstance(p["body"], dict) and "commit" in p["body"]]
    assert len(commits) == 1  # one commit per partition
    ids = {d["url"] for p in adds for d in p["body"]}
    assert ids == {"http://a.com/1", "http://b.com/1", "http://b.com/2"}  # SKIP dropped
    assert {i for p in dels for i in p["body"]["delete"]} == {"http://a.com/2"}
    for p in posts:
        assert p["url"] == "http://solr:8983/solr/nutch/update"
        assert p["headers"]["Content-Type"] == "application/json"


def test_solr_delete_gate_and_batch_size(tmp_path):
    from nutch_spark.sources.indexers import SolrIndexWriter

    cap = str(tmp_path / "solr")
    w = SolrIndexWriter(_solr_capture(cap), urls="http://s/solr/c", batch_size=3)
    w.open(0)
    # delete flag off (IndexerMapReduce.INDEXER_DELETE false): deletes dropped
    w.delete(["http://a.com/x"])
    w.write([{"url": f"http://a.com/{i}"} for i in range(4)])  # crosses batch=3
    mid = _solr_posts(cap)
    assert len(mid) == 1 and len(mid[0]["body"]) == 3  # pushed mid-stream
    w.commit()
    posts = _solr_posts(cap)
    assert not any("delete" in p["body"] for p in posts if isinstance(p["body"], dict))
    all_ids = [d["url"] for p in posts if isinstance(p["body"], list) for d in p["body"]]
    assert len(all_ids) == 4


def test_solr_auth_params_fanout_and_field_hygiene(tmp_path):
    import datetime

    from nutch_spark.sources.indexers import SolrIndexWriter

    cap = str(tmp_path / "solr")
    w = SolrIndexWriter(
        _solr_capture(cap),
        urls=["http://s1/solr/c", "http://s2/solr/c"],
        username="u",
        password="p",
        params="update.chain=dedup&commitWithin=1000",
        weight_field="boost",
    )
    w.open(0)
    w.write(
        [
            {
                "url": "http://a.com/1",
                "title": "bad\x00ctl﷕ok￿",
                "content": "tab\tand\nnewline stay",
                "tstamp": datetime.datetime(2026, 1, 2, 3, 4, 5),
                "weight": 2.5,
            }
        ]
    )
    w.commit()
    posts = _solr_posts(cap)
    # fan-out: every request goes to both configured urls, with params
    urls = {p["url"] for p in posts}
    assert urls == {
        "http://s1/solr/c/update?update.chain=dedup&commitWithin=1000",
        "http://s2/solr/c/update?update.chain=dedup&commitWithin=1000",
    }
    # basic auth header present
    assert all(p["headers"]["Authorization"].startswith("Basic ") for p in posts)
    doc = next(p["body"] for p in posts if isinstance(p["body"], list))[0]
    assert doc["title"] == "badctlok"  # NUL, U+FDD5 noncharacter, U+FFFF stripped
    assert doc["content"] == "tab\tand\nnewline stay"  # \t \n survive
    assert doc["tstamp"] == "2026-01-02T03:04:05Z"  # ISO_INSTANT
    assert doc["boost"] == 2.5  # weight field


# --- RabbitMQ (indexer-rabbit/.../RabbitIndexWriter.java) -------------------


def test_rabbit_multiple_mode_frames_one_message(tmp_path):
    from nutch_spark.sources.indexers import RabbitIndexWriter

    sent = []
    w = RabbitIndexWriter(
        lambda ex, rk, body, hdrs: sent.append((ex, rk, json.loads(body), hdrs)),
        headers_static="app=nutch,env=test",
    )
    w.open(0)
    w.write([{"url": "http://a.com/1", "title": "t1", "weight": 2.0}])
    w.delete(["http://a.com/2"])
    assert sent == []  # nothing until commit
    w.commit()
    (ex, rk, body, hdrs), = sent
    assert (ex, rk) == ("nutch.exchange", "nutch.key")
    assert hdrs == {"app": "nutch", "env": "test"}
    # Gson rendering of RabbitMessage/RabbitDocument
    assert body["docsToDelete"] == ["http://a.com/2"]
    assert body["docsToUpdate"] == []
    (doc,) = body["docsToWrite"]
    assert doc["documentBoost"] == 2.0
    fields = {f["key"]: f["values"] for f in doc["fields"]}
    assert fields["url"] == ["http://a.com/1"] and fields["title"] == ["t1"]


def test_rabbit_single_mode_and_commit_size(tmp_path):
    from nutch_spark.sources.indexers import RabbitIndexWriter

    sent = []
    w = RabbitIndexWriter(
        lambda ex, rk, body, hdrs: sent.append((body, hdrs)),
        commit_mode="single",
        commit_size=3,
    )
    w.open(0)
    w.delete(["http://a.com/del"])
    w.write([{"url": f"http://a.com/{i}"} for i in range(2)])  # buffer hits 3
    # commit_size crossed mid-write: deletes publish first, then writes
    assert [h["action"] for _, h in sent] == ["delete", "write", "write"]
    assert sent[0][0] == b"http://a.com/del"
    sent.clear()
    w.commit()
    assert sent == []  # buffer already flushed


# --- CloudSearch (indexer-cloudsearch/.../CloudSearchIndexWriter.java) ------


def test_cloudsearch_batch_format(tmp_path):
    import datetime
    import hashlib

    from nutch_spark.sources.indexers import CloudSearchIndexWriter

    batches = []
    w = CloudSearchIndexWriter(lambda body: batches.append(json.loads(body)))
    w.open(0)
    w.write(
        [
            {
                "url": "http://a.com/1",
                "Content-Type": "text/html",  # cleaned to content_type
                "tstamp": datetime.datetime(2026, 1, 2, 3, 4, 5, 789000),
                "anchor": ["a1", "a2"],
            }
        ]
    )
    w.delete(["http://a.com/2"])
    w.commit()
    (batch,) = batches
    add, dele = batch
    assert add["type"] == "add"
    assert add["id"] == hashlib.sha512(b"http://a.com/1").hexdigest()
    assert add["fields"]["content_type"] == "text/html"  # cleanFieldName
    assert add["fields"]["tstamp"] == "2026-01-02T03:04:05.789Z"
    assert add["fields"]["anchor"] == ["a1", "a2"]  # accumulate
    assert dele == {
        "type": "delete",
        "id": hashlib.sha512(b"http://a.com/2").hexdigest(),
    }


def test_cloudsearch_max_docs_and_oversize_skip():
    from nutch_spark.sources.indexers import CloudSearchIndexWriter

    batches = []
    w = CloudSearchIndexWriter(
        lambda body: batches.append(json.loads(body)), max_docs_in_batch=2
    )
    w.open(0)
    w.write([{"url": f"http://a.com/{i}"} for i in range(5)])
    w.write([{"url": "http://big.com/", "content": "x" * (2 << 20)}])  # >1MiB: skip
    w.commit()
    assert [len(b) for b in batches] == [2, 2, 1]
    all_types = [e["type"] for b in batches for e in b]
    assert all_types == ["add"] * 5  # the oversized doc never shipped
