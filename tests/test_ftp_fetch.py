"""protocol-ftp tests (Ftp.java / FtpResponse.java): ftp_fetch_fn against a
minimal in-process FTP server (socket-level stub speaking enough RFC 959 for
stdlib ftplib: USER/PASS/TYPE/PASV/RETR/NLST/CWD/QUIT) — the protocol
conversation is real, only the filesystem is faked."""

from __future__ import annotations

import socket
import threading

import pytest

from nutch_spark.operators.fetcher import ftp_fetch_fn

FILES = {
    "/pub/readme.txt": b"hello from ftp",
    "/pub/index.html": b"<html><body>page</body></html>",
}
DIRS = {"/", "/pub", "/pub/sub"}
DIR_LISTS = {"/pub/": ["readme.txt", "index.html", "sub"], "/": ["pub"], "/pub/sub/": []}


class _StubFtpServer(threading.Thread):
    """One control connection at a time; PASV data socket per transfer."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.stop = False

    def run(self) -> None:
        while not self.stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        rf = conn.makefile("rb")

        def send(line: str) -> None:
            conn.sendall((line + "\r\n").encode())

        data_srv: socket.socket | None = None
        cwd = "/"
        send("220 stub FTP ready")
        while True:
            raw = rf.readline()
            if not raw:
                break
            cmd, _, arg = raw.decode().strip().partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                send("331 need password" if arg == "anonymous" else "530 bad user")
            elif cmd == "PASS":
                send("230 logged in")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "PASV":
                data_srv = socket.create_server(("127.0.0.1", 0))
                p = data_srv.getsockname()[1]
                send(f"227 entering passive (127,0,0,1,{p >> 8},{p & 255})")
            elif cmd == "CWD":
                path = arg if arg.startswith("/") else cwd.rstrip("/") + "/" + arg
                if path.rstrip("/") in {d.rstrip("/") for d in DIRS}:
                    cwd = path if path.endswith("/") else path + "/"
                    send("250 ok")
                else:
                    send("550 no such dir")
            elif cmd in ("RETR", "NLST"):
                if data_srv is None:
                    send("425 use PASV first")
                    continue
                if cmd == "RETR":
                    path = arg if arg.startswith("/") else cwd + arg
                    payload = FILES.get(path)
                    if payload is None:
                        send("550 no such file")
                        data_srv.close(); data_srv = None
                        continue
                else:
                    names = DIR_LISTS.get(cwd, [])
                    payload = "".join(n + "\r\n" for n in names).encode()
                send("150 opening data connection")
                dconn, _ = data_srv.accept()
                dconn.sendall(payload)
                dconn.close(); data_srv.close(); data_srv = None
                send("226 transfer complete")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("502 not implemented")
        conn.close()


@pytest.fixture(scope="module")
def ftp_server():
    srv = _StubFtpServer()
    srv.start()
    yield f"127.0.0.1:{srv.port}"
    srv.stop = True
    srv.sock.close()


def test_ftp_file_success(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/readme.txt")
    assert r["status"] == "fetch_success"
    assert r["content"] == b"hello from ftp"
    assert r["content_type"] == "text/plain"
    assert r["metadata"]["nutch.protocol.code"] == "200"


def test_ftp_html_sniff(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/index.html")
    assert r["status"] == "fetch_success"
    assert r["content_type"] == "text/html"


def test_ftp_directory_listing(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/")
    assert r["status"] == "fetch_success"
    assert r["content_type"] == "text/html"
    # names sorted, entity-escaped markup like file_fetch_fn's listing
    assert b'<a href="index.html">index.html</a>' in r["content"]
    assert r["content"].index(b"index.html") < r["content"].index(b"readme.txt")


def test_ftp_dir_without_slash_redirects(ftp_server):
    # FtpResponse.java:391-414 — RETR on a directory → 300 + Location +'/'
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/sub")
    assert r["status"] == "fetch_redir_perm"
    assert r["metadata"]["nutch.protocol.code"] == "300"
    assert r["metadata"]["Location"] == f"ftp://{ftp_server}/pub/sub/"


def test_ftp_missing_file_gone(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/nope.txt")
    assert r["status"] == "fetch_gone"
    assert r["metadata"]["nutch.protocol.code"] == "404"


def test_ftp_bad_login_gone(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/readme.txt", user_name="mallory")
    assert r["status"] == "fetch_gone"
    assert r["metadata"]["nutch.protocol.code"] == "401"


def test_ftp_connection_refused_retries():
    r = ftp_fetch_fn("ftp://127.0.0.1:1/x", timeout_s=2)
    assert r["status"] == "fetch_retry"
    assert "_exception_" in r["metadata"]


def test_ftp_truncation(ftp_server):
    r = ftp_fetch_fn(f"ftp://{ftp_server}/pub/readme.txt", max_bytes=5)
    assert r["status"] == "fetch_success"
    assert r["content"] == b"hello"


def test_ftp_through_fetch_harness(spark, ftp_server):
    # the same polite-fetch pipeline used for HTTP drives FTP URLs
    from nutch_spark.operators.fetcher import fetch

    fl = spark.createDataFrame(
        [
            (f"ftp://{ftp_server}/pub/readme.txt",),
            (f"ftp://{ftp_server}/pub/nope.txt",),
        ],
        "url string",
    )
    rows = {r["url"]: r for r in fetch(fl, fetch_fn=ftp_fetch_fn, num_lists=1).collect()}
    assert rows[f"ftp://{ftp_server}/pub/readme.txt"]["status"] == "fetch_success"
    assert rows[f"ftp://{ftp_server}/pub/nope.txt"]["status"] == "fetch_gone"
