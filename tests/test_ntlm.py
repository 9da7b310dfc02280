"""NTLMv2 authentication: [MS-NLMP] published vectors + a live 3-leg
handshake against an in-process verifying server (the analogue of the
reference's commons-httpclient NTLMScheme behind
HttpAuthenticationFactory.java:79)."""

from __future__ import annotations

import base64
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from nutch_spark.functions.ntlm import (
    build_authenticate,
    build_negotiate,
    md4,
    ntlm_fetch,
    ntlmv2_responses,
    ntowf_v2,
    parse_challenge,
)
from nutch_spark.operators.fetcher import http_fetch_fn

# ---------------------------------------------------------------------------
# published vectors
# ---------------------------------------------------------------------------


def test_md4_rfc1320_vectors():
    vectors = {
        b"": "31d6cfe0d16ae931b73c59d7e0c089c0",
        b"a": "bde52cb31de33e46245e05fbdbd6fb24",
        b"abc": "a448017aaf21d8525fc10ae87aa6729d",
        b"message digest": "d9130a8164549fe818874806e1c7014b",
        b"abcdefghijklmnopqrstuvwxyz": "d79e1c308aa5bbcdeea8ed63df412da9",
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789":
            "043f8582f241db351ce627e153e7f0e4",
        b"1234567890" * 8: "e33b4ddc9c38f2199c3e7b164fcc0536",
    }
    for msg, digest in vectors.items():
        assert md4(msg).hex() == digest, msg


# [MS-NLMP] §4.2 protocol examples: User/Domain/Password, server challenge
# 0123456789abcdef, client challenge aa*8, time 0
_SPEC_TI = bytes.fromhex(
    "02000c0044006f006d00610069006e0001000c00"
    "53006500720076006500720000000000"
)


def test_ntowf_v2_spec_vector():
    assert (
        ntowf_v2("User", "Password", "Domain").hex()
        == "0c868a403bfd7a93a3001ef22ef02e3f"
    )


def test_ntlmv2_responses_spec_vectors():
    nt, lm = ntlmv2_responses(
        "User", "Password", "Domain",
        bytes.fromhex("0123456789abcdef"), _SPEC_TI,
        client_challenge=b"\xaa" * 8, timestamp_100ns=0,
    )
    assert nt[:16].hex() == "68cd0ab851e51c96aabc927bebef6a1c"  # NTProofStr
    assert lm.hex() == "86c35097ac9cec102554764a57cccc19" + "aa" * 8


def test_message_codecs_round_trip():
    neg = build_negotiate()
    assert neg[:8] == b"NTLMSSP\x00" and struct.unpack("<I", neg[8:12])[0] == 1
    challenge = _make_challenge(bytes.fromhex("0123456789abcdef"), _SPEC_TI)
    sc, ti = parse_challenge(challenge)
    assert sc == bytes.fromhex("0123456789abcdef") and ti == _SPEC_TI
    auth = build_authenticate(
        "User", "Password", "Domain", sc, ti,
        client_challenge=b"\xaa" * 8, timestamp_100ns=0,
    )
    assert struct.unpack("<I", auth[8:12])[0] == 3
    nt_len, _, nt_off = struct.unpack("<HHI", auth[20:28])
    assert auth[nt_off : nt_off + 16].hex() == "68cd0ab851e51c96aabc927bebef6a1c"
    usr_len, _, usr_off = struct.unpack("<HHI", auth[36:44])
    assert auth[usr_off : usr_off + usr_len].decode("utf-16-le") == "User"


# ---------------------------------------------------------------------------
# live verifying server
# ---------------------------------------------------------------------------


def _make_challenge(server_challenge: bytes, target_info: bytes) -> bytes:
    payload_off = 48
    target_name = b""
    return (
        b"NTLMSSP\x00"
        + struct.pack("<I", 2)
        + struct.pack("<HHI", len(target_name), len(target_name), payload_off)
        + struct.pack("<I", 0x00008201)
        + server_challenge
        + b"\x00" * 8
        + struct.pack(
            "<HHI", len(target_info), len(target_info), payload_off + len(target_name)
        )
        + target_name
        + target_info
    )


def _ntlm_server(
    user: str,
    password: str,
    domain: str,
    *,
    gzip_granted: bool = False,
    challenge_body: bytes = b"",
):
    server_challenge = bytes.fromhex("0011223344556677")
    target_info = _SPEC_TI

    class NtlmHandler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # the 3 legs must share one connection

        def log_message(self, *args):  # noqa: D102
            pass

        def _reply(self, code, body=b"", extra=None):
            self.send_response(code)
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802, D102
            authz = self.headers.get("Authorization", "")
            if not authz.startswith("NTLM "):
                self._reply(401, b"auth required", {"WWW-Authenticate": "NTLM"})
                return
            msg = base64.b64decode(authz[5:])
            mtype = struct.unpack("<I", msg[8:12])[0]
            if mtype == 1:
                token = base64.b64encode(
                    _make_challenge(server_challenge, target_info)
                ).decode()
                self._reply(
                    401, challenge_body, {"WWW-Authenticate": f"NTLM {token}"}
                )
                return
            assert mtype == 3
            nt_len, _, nt_off = struct.unpack("<HHI", msg[20:28])
            nt = msg[nt_off : nt_off + nt_len]
            usr_len, _, usr_off = struct.unpack("<HHI", msg[36:44])
            got_user = msg[usr_off : usr_off + usr_len].decode("utf-16-le")
            proof, blob = nt[:16], nt[16:]
            import hmac as _hmac

            key = ntowf_v2(got_user, password, domain)
            expected = _hmac.new(key, server_challenge + blob, "md5").digest()
            if got_user == user and _hmac.compare_digest(proof, expected):
                if gzip_granted:
                    import gzip as _gzip

                    self._reply(
                        200,
                        _gzip.compress(b"ntlm granted"),
                        {"Content-Encoding": "gzip"},
                    )
                else:
                    self._reply(200, b"ntlm granted")
            else:
                self._reply(403, b"bad proof")

    return ThreadingHTTPServer(("127.0.0.1", 0), NtlmHandler)


def test_ntlm_fetch_three_leg_handshake():
    srv = _ntlm_server("alice", "s3cret", "CORP")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        status, _hdrs, body = ntlm_fetch(
            f"{base}/private", "CORP\\alice", "s3cret"
        )
        assert status == 200 and body == b"ntlm granted"
        # wrong password → proof mismatch → 403
        status, _hdrs, _ = ntlm_fetch(f"{base}/private", "CORP\\alice", "wrong")
        assert status == 403
    finally:
        srv.shutdown()


def test_http_fetch_fn_answers_ntlm_challenge():
    """The crawler path: http_fetch_fn hits the 401 NTLM challenge and
    completes the handshake with its host-scoped credentials."""
    srv = _ntlm_server("bob", "pw2", "")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        out = http_fetch_fn(f"{base}/private", auth={"127.0.0.1": ("bob", "pw2")})
        assert out["status"] == "fetch_success"
        assert out["content"] == b"ntlm granted"
        # no credentials: the 401 surfaces as fetch_gone, like basic/digest
        out = http_fetch_fn(f"{base}/private")
        assert out["status"] == "fetch_gone"
    finally:
        srv.shutdown()


def test_http_fetch_fn_decompresses_gzipped_ntlm_response():
    """The NTLM success path must honour Content-Encoding like the
    normal 200 path — we advertise Accept-Encoding on every leg, so a
    server that gzips the authenticated response must not yield
    garbage text."""
    srv = _ntlm_server("bob", "pw2", "", gzip_granted=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        out = http_fetch_fn(f"{base}/private", auth={"127.0.0.1": ("bob", "pw2")})
        assert out["status"] == "fetch_success"
        assert out["content"] == b"ntlm granted"
    finally:
        srv.shutdown()


def test_ntlm_fetch_drains_oversized_challenge_body():
    """A 401 challenge body larger than max_bytes must be drained to
    EOF, or the unread bytes corrupt the third leg's response parse on
    the shared keep-alive connection."""
    srv = _ntlm_server("eve", "pw3", "", challenge_body=b"e" * 4096)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        status, _hdrs, body = ntlm_fetch(
            f"{base}/private", "eve", "pw3", max_bytes=64
        )
        assert status == 200 and body == b"ntlm granted"[:64]
    finally:
        srv.shutdown()


def test_ntlm_fetch_gives_up_on_unbounded_challenge_body():
    """A challenge leg whose body exceeds the drain cap can't safely share
    the keep-alive connection — ntlm_fetch returns the 401 instead of
    looping forever (round-9 review finding)."""
    srv = _ntlm_server("eve", "pw3", "", challenge_body=b"e" * ((1 << 20) + 4096))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        status, _hdrs, body = ntlm_fetch(f"{base}/private", "eve", "pw3")
        assert status == 401 and body == b""
    finally:
        srv.shutdown()
