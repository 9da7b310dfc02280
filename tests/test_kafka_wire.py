"""Kafka live producer: the socket-level wire protocol client behind
KafkaIndexWriter (r7 verdict #7 — "point it at a broker and go" parity with
the Solr/ES live transports). A fake in-process broker DECODES the real
Produce v3 request — framing, record-batch v2 header, CRC32C, zigzag-varint
records — and answers with a real Produce v3 response, over actual TCP from
Spark executors. Reference: src/plugin/indexer-kafka/.../KafkaIndexWriter.java
opens a KafkaProducer with the same acks-1/flush-on-commit contract."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from nutch_spark.sources.kafka_wire import (
    KafkaWireError,
    KafkaWireProducer,
    crc32c,
    decode_record_batch,
    decode_varint,
    encode_record_batch,
    encode_varint,
    kafka_wire_producer_factory,
)

# ---------------------------------------------------------------------------
# pure codec units
# ---------------------------------------------------------------------------


def test_crc32c_known_check_value():
    # the published CRC-32C check value for the ASCII digits string
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_varint_zigzag_round_trip():
    for n in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31 - 1, -(2**31), 10**12):
        buf = encode_varint(n)
        val, pos = decode_varint(buf, 0)
        assert (val, pos) == (n, len(buf)), n
    assert encode_varint(0) == b"\x00"
    assert encode_varint(-1) == b"\x01"
    assert encode_varint(1) == b"\x02"


def test_record_batch_round_trip_and_crc():
    records = [(b"k1", b"v1"), (b"k2", None), (None, b"orphan-value")]
    blob = encode_record_batch(records, 1700000000000)
    assert decode_record_batch(blob) == records
    # flip one payload byte -> CRC must catch it
    corrupt = bytearray(blob)
    corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batch(bytes(corrupt))


# ---------------------------------------------------------------------------
# fake broker: a real TCP server that parses Produce v3 for real
# ---------------------------------------------------------------------------


class FakeBroker:
    def __init__(self, error_code: int = 0):
        self.error_code = error_code
        self.batches: list[tuple[str, int, list]] = []
        self.client_ids: list[str] = []
        self.lock = threading.Lock()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.port = self.sock.getsockname()[1]
        self._stop = False
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _read_exact(self, conn, n):
        buf = bytearray()
        while len(buf) < n:
            piece = conn.recv(n - len(buf))
            if not piece:
                raise ConnectionError("eof")
            buf += piece
        return bytes(buf)

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn):
        try:
            while True:
                (req_len,) = struct.unpack(">i", self._read_exact(conn, 4))
                req = self._read_exact(conn, req_len)
                api_key, version, corr = struct.unpack(">hhi", req[:8])
                assert api_key == 0 and version == 3, (api_key, version)
                pos = 8
                (cid_len,) = struct.unpack_from(">h", req, pos)
                pos += 2
                cid = req[pos : pos + cid_len].decode()
                pos += cid_len
                (tx_len,) = struct.unpack_from(">h", req, pos)
                pos += 2 + max(tx_len, 0)
                _acks, _timeout, n_topics = struct.unpack_from(">hii", req, pos)
                pos += 10
                parsed = []
                for _ in range(n_topics):
                    (tlen,) = struct.unpack_from(">h", req, pos)
                    pos += 2
                    topic = req[pos : pos + tlen].decode()
                    pos += tlen
                    (n_parts,) = struct.unpack_from(">i", req, pos)
                    pos += 4
                    for _ in range(n_parts):
                        part, blob_len = struct.unpack_from(">ii", req, pos)
                        pos += 8
                        blob = req[pos : pos + blob_len]
                        pos += blob_len
                        # the REAL decode: magic, CRC32C, varint records
                        records = decode_record_batch(blob)
                        parsed.append((topic, part, records))
                with self.lock:
                    self.client_ids.append(cid)
                    self.batches.extend(parsed)
                # Produce v3 response
                body = bytearray(struct.pack(">i", corr))
                topics = sorted({t for t, _, _ in parsed})
                body += struct.pack(">i", len(topics))
                for topic in topics:
                    parts = [p for t, p, _ in parsed if t == topic]
                    traw = topic.encode()
                    body += struct.pack(">h", len(traw)) + traw
                    body += struct.pack(">i", len(parts))
                    for p in parts:
                        body += struct.pack(">ihqq", p, self.error_code, 0, -1)
                body += struct.pack(">i", 0)  # throttle_time_ms
                conn.sendall(struct.pack(">i", len(body)) + bytes(body))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def close(self):
        self._stop = True
        self.sock.close()


@pytest.fixture()
def broker():
    b = FakeBroker()
    yield b
    b.close()


def test_producer_ships_batches_and_tombstones(broker):
    p = KafkaWireProducer("127.0.0.1", broker.port, client_id="t1")
    p.send("nutch", b"http://a/1", b'{"url": "http://a/1"}')
    p.send("nutch", b"http://a/2", None)  # tombstone delete
    p.send("other", b"k", b"v")
    p.flush()
    p.close()
    assert broker.client_ids == ["t1"]
    got = {(t, p_): recs for t, p_, recs in broker.batches}
    assert got[("nutch", 0)] == [
        (b"http://a/1", b'{"url": "http://a/1"}'),
        (b"http://a/2", None),
    ]
    assert got[("other", 0)] == [(b"k", b"v")]
    # empty flush is a no-op (no stray request)
    p2 = KafkaWireProducer("127.0.0.1", broker.port)
    p2.flush()
    assert len(broker.client_ids) == 1


def test_producer_raises_on_broker_error_and_keeps_buffer():
    b = FakeBroker(error_code=3)  # UNKNOWN_TOPIC_OR_PARTITION
    try:
        p = KafkaWireProducer("127.0.0.1", b.port)
        p.send("ghost", b"k", b"v")
        with pytest.raises(KafkaWireError, match="rejected"):
            p.flush()
        # at-least-once: the buffer survives the failure for a retry
        assert p._buf
    finally:
        b.close()


def test_producer_connection_failure_raises():
    dead = socket.socket()
    dead.bind(("127.0.0.1", 0))
    port = dead.getsockname()[1]
    dead.close()  # nothing listening
    p = KafkaWireProducer("127.0.0.1", port, timeout_s=1.0)
    p.send("t", b"k", b"v")
    with pytest.raises(KafkaWireError, match="produce failed"):
        p.flush()


def test_kafka_index_writer_live_round_trip(spark, broker):
    """The full r7 live-sink pattern: Spark partitions → KafkaIndexWriter →
    socket producer → fake broker, add + tombstone over real TCP."""
    import json as _json

    from nutch_spark.sources.indexers import KafkaIndexWriter, index_documents

    docs = spark.createDataFrame(
        [
            ("http://k.example.com/1", "ADD", "kafka doc one"),
            ("http://k.example.com/2", "DELETE", None),
            ("http://k.example.com/3", "SKIP", "never shipped"),
        ],
        "url string, action string, content string",
    ).coalesce(1)
    factory = kafka_wire_producer_factory(f"127.0.0.1:{broker.port}")
    index_documents(
        docs, {"kafka": lambda: KafkaIndexWriter(factory, topic="nutch")}
    )
    recs = [r for t, _, batch in broker.batches if t == "nutch" for r in batch]
    adds = {k.decode(): _json.loads(v) for k, v in recs if v is not None}
    assert "http://k.example.com/1" in adds
    assert adds["http://k.example.com/1"]["content"] == "kafka doc one"
    assert "http://k.example.com/3" not in adds  # SKIP dropped
    tombstones = [k.decode() for k, v in recs if v is None]
    assert tombstones == ["http://k.example.com/2"]
