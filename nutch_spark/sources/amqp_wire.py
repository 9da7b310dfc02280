"""Socket-level AMQP 0-9-1 client — the opt-in LIVE transport behind
:class:`nutch_spark.sources.indexers.RabbitIndexWriter` and
``publish-rabbitmq`` (sources/publishers.py).

The reference opens a real RabbitMQ connection (indexer-rabbit
RabbitIndexWriter.java / publish-rabbitmq RabbitMQPublisherImpl.java via the
amqp-client library); this container has no pika, so the client speaks the
PUBLIC AMQP 0-9-1 wire protocol directly:

- protocol header ``AMQP\\x00\\x00\\x09\\x01`` then the method handshake
  (Start/StartOk with SASL PLAIN, Tune/TuneOk, Open/OpenOk), channel open
- ``exchange.declare`` / ``queue.declare`` / ``queue.bind`` — the same
  topology bootstrap the reference performs (binding kind "direct")
- ``basic.publish`` as method + content-header (delivery-mode, headers
  table) + body frames, split at the negotiated frame-max

Publish-only, one channel, no publisher confirms (the reference's default
channel has none either) — delivery is fire-and-forget like amqp-client's
basicPublish; callers needing durability set ``delivery_mode=2`` and a
durable queue, exactly as with the reference plugin's config.
"""

from __future__ import annotations

import socket
import struct

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_END = 1, 2, 3, 0xCE


def _shortstr(s: str) -> bytes:
    raw = s.encode()
    if len(raw) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(raw)]) + raw


def _longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def encode_table(d: dict) -> bytes:
    """AMQP field table: only the types a publisher needs (longstr 'S',
    signed-long 'I', bool 't', nested table 'F')."""
    body = bytearray()
    for k, v in (d or {}).items():
        body += _shortstr(str(k))
        if isinstance(v, bool):
            body += b"t" + (b"\x01" if v else b"\x00")
        elif isinstance(v, int):
            body += b"I" + struct.pack(">i", v)
        elif isinstance(v, dict):
            body += b"F" + encode_table(v)
        else:
            body += b"S" + _longstr(str(v).encode())
    return _longstr(bytes(body))


def decode_table(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    (size,) = struct.unpack_from(">I", buf, pos)
    end = pos + 4 + size
    pos += 4
    out: dict = {}
    while pos < end:
        klen = buf[pos]
        key = buf[pos + 1 : pos + 1 + klen].decode()
        pos += 1 + klen
        t = buf[pos : pos + 1]
        pos += 1
        if t == b"S":
            (vlen,) = struct.unpack_from(">I", buf, pos)
            out[key] = buf[pos + 4 : pos + 4 + vlen].decode()
            pos += 4 + vlen
        elif t == b"I":
            (out[key],) = struct.unpack_from(">i", buf, pos)
            pos += 4
        elif t == b"t":
            out[key] = bool(buf[pos])
            pos += 1
        elif t == b"F":
            out[key], pos = decode_table(buf, pos)
        else:
            raise ValueError(f"unsupported field-table type {t!r}")
    return out, end


class AmqpWireError(RuntimeError):
    pass


class AmqpWireClient:
    """Minimal publish-side AMQP 0-9-1 connection: handshake on construction,
    ``declare_direct`` for the reference's exchange/queue/binding bootstrap,
    ``publish(exchange, routing_key, body, headers)`` matching the injection
    surface of RabbitIndexWriter / RabbitMQPublisher, ``close``."""

    def __init__(
        self,
        host: str,
        port: int = 5672,
        *,
        user: str = "guest",
        password: str = "guest",
        vhost: str = "/",
        timeout_s: float = 10.0,
        delivery_mode: int = 1,
    ) -> None:
        self.delivery_mode = delivery_mode
        self.frame_max = 131072
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        try:
            self._handshake(user, password, vhost)
        except BaseException:
            self._sock.close()
            raise

    # --- framing -----------------------------------------------------------

    def _send_frame(self, ftype: int, channel: int, payload: bytes) -> None:
        self._sock.sendall(
            struct.pack(">BHI", ftype, channel, len(payload))
            + payload
            + bytes([FRAME_END])
        )

    def _send_method(self, channel: int, class_id: int, method_id: int, args: bytes) -> None:
        self._send_frame(
            FRAME_METHOD, channel, struct.pack(">HH", class_id, method_id) + args
        )

    def _read_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            piece = self._sock.recv(n - len(buf))
            if not piece:
                raise AmqpWireError("broker closed connection")
            buf += piece
        return bytes(buf)

    def _read_frame(self) -> tuple[int, int, bytes]:
        ftype, channel, size = struct.unpack(">BHI", self._read_exact(7))
        payload = self._read_exact(size)
        if self._read_exact(1)[0] != FRAME_END:
            raise AmqpWireError("bad frame end")
        return ftype, channel, payload

    def _expect_method(self, class_id: int, method_id: int) -> bytes:
        while True:
            ftype, _channel, payload = self._read_frame()
            if ftype != FRAME_METHOD:
                continue  # skip heartbeats etc.
            cid, mid = struct.unpack_from(">HH", payload)
            if (cid, mid) == (10, 50) or (cid, mid) == (20, 40):
                raise AmqpWireError(f"broker closed: {payload[4:].hex()}")
            if (cid, mid) != (class_id, method_id):
                raise AmqpWireError(
                    f"expected method {class_id}.{method_id}, got {cid}.{mid}"
                )
            return payload[4:]

    # --- handshake ---------------------------------------------------------

    def _handshake(self, user: str, password: str, vhost: str) -> None:
        self._sock.sendall(b"AMQP\x00\x00\x09\x01")
        self._expect_method(10, 10)  # connection.start
        props = encode_table({"product": "nutch-spark", "version": "1.0"})
        sasl = _longstr(b"\x00" + user.encode() + b"\x00" + password.encode())
        self._send_method(
            0, 10, 11, props + _shortstr("PLAIN") + sasl + _shortstr("en_US")
        )
        tune = self._expect_method(10, 30)  # connection.tune
        channel_max, frame_max, heartbeat = struct.unpack_from(">HIH", tune)
        self.frame_max = min(frame_max or 131072, 131072)
        self._send_method(
            0, 10, 31, struct.pack(">HIH", channel_max, self.frame_max, 0)
        )
        self._send_method(0, 10, 40, _shortstr(vhost) + _shortstr("") + b"\x00")
        self._expect_method(10, 41)  # connection.open-ok
        self._send_method(1, 20, 10, _shortstr(""))  # channel.open
        self._expect_method(20, 11)

    # --- topology (RabbitIndexWriter.java openIndexWriter: declares the
    # exchange + queue + binding unless rabbitmq.binding=false) -------------

    def declare_direct(
        self, exchange: str, queue: str, routing_key: str, *, durable: bool = True
    ) -> None:
        flags = 0x02 if durable else 0x00  # durable bit
        self._send_method(
            1, 40, 10,
            struct.pack(">H", 0) + _shortstr(exchange) + _shortstr("direct")
            + bytes([flags]) + encode_table({}),
        )
        self._expect_method(40, 11)
        self._send_method(
            1, 50, 10,
            struct.pack(">H", 0) + _shortstr(queue) + bytes([flags])
            + encode_table({}),
        )
        self._expect_method(50, 11)
        self._send_method(
            1, 50, 20,
            struct.pack(">H", 0) + _shortstr(queue) + _shortstr(exchange)
            + _shortstr(routing_key) + b"\x00" + encode_table({}),
        )
        self._expect_method(50, 21)

    # --- publish -----------------------------------------------------------

    def publish(
        self, exchange: str, routing_key: str, body: bytes, headers: dict | None = None
    ) -> None:
        self._send_method(
            1, 60, 40,
            struct.pack(">H", 0) + _shortstr(exchange) + _shortstr(routing_key)
            + b"\x00",
        )
        # content header: class 60, weight 0, body size, property flags.
        # flags (from bit 15): content-type, content-encoding, headers,
        # delivery-mode — we always send delivery-mode, headers when given.
        flags = 0x1000  # delivery-mode
        props = bytes([self.delivery_mode])
        if headers:
            flags |= 0x2000  # headers table
            props = encode_table(headers) + props
        self._send_frame(
            FRAME_HEADER, 1,
            struct.pack(">HHQH", 60, 0, len(body), flags) + props,
        )
        max_body = self.frame_max - 8
        for i in range(0, len(body), max_body):  # zero frames for empty body
            self._send_frame(FRAME_BODY, 1, body[i : i + max_body])

    def close(self) -> None:
        # connection.close (10,50) args per AMQP 0-9-1 §1.4.2.6:
        # reply-code(short), reply-text(shortstr), class-id(short),
        # method-id(short) — in THAT order; strict brokers log a frame
        # error on the wrong layout and treat it as an abrupt close
        try:
            self._send_method(
                0, 10, 50,
                struct.pack(">H", 200) + _shortstr("Goodbye")
                + struct.pack(">HH", 0, 0),
            )
        except OSError:
            pass
        finally:
            self._sock.close()


def amqp_publisher_factory(
    host: str,
    port: int = 5672,
    *,
    user: str = "guest",
    password: str = "guest",
    vhost: str = "/",
    exchange: str = "nutch.exchange",
    queue: str = "nutch.queue",
    routing_key: str = "nutch.key",
    declare: bool = True,
    **kwargs,
):
    """Zero-arg factory for the executor side: opens the connection, runs
    the reference's topology bootstrap, and returns a client whose
    ``publish`` matches RabbitIndexWriter / RabbitMQPublisher's injected
    surface. Only config travels in the closure; the socket opens on the
    executor (same pattern as kafka_wire.kafka_wire_producer_factory)."""

    def build() -> AmqpWireClient:
        client = AmqpWireClient(
            host, port, user=user, password=password, vhost=vhost, **kwargs
        )
        if declare:
            client.declare_direct(exchange, queue, routing_key)
        return client

    return build
