"""parse-ext — delegate parsing to an external command per content type.

Reference: src/plugin/parse-ext/src/java/org/apache/nutch/parse/ext/
ExtParser.java: a contentType → (command, timeout, encoding) table; the
raw content is piped to the command's stdin and its stdout becomes the
parse text (outlinks are then harvested from that text with
OutlinkExtractor — our ``extract_text_outlinks`` covers that pass).

Spark shape: an Arrow-batched ``mapInPandas`` whose per-row work shells out
through ``run_command`` — a picklable callable so tests can fake the
subprocess and deployments can sandbox it. One hostile document costs its
row (empty text + _ext_error_), never the task.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def subprocess_command_fn(timeout_s: float = 30.0) -> Callable[[list[str], bytes], bytes]:
    """Default runner: ``cmd`` argv with the content on stdin, stdout back
    (CommandRunner semantics incl. the timeout kill)."""

    def run(cmd: list[str], payload: bytes) -> bytes:
        import subprocess

        return subprocess.run(
            cmd,
            input=payload,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            timeout=timeout_s,
            check=True,
        ).stdout

    return run


EXT_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("parse_text", T.StringType(), True),
        T.StructField("ext_error", T.StringType(), True),
    ]
)


def ext_parse(
    fetch_log: DataFrame,
    type_commands: dict[str, list[str]],
    *,
    run_command: Callable[[list[str], bytes], bytes] | None = None,
    url: str = "url",
    content: str = "content",
    content_type: str = "content_type",
    encoding: str = "utf-8",
) -> DataFrame:
    """(url, content, content_type) → (url, parse_text, ext_error).

    ``type_commands`` is ExtParser's TYPE_PARAMS_MAP: contentType → argv.
    Rows whose type has no command are dropped (the reference returns a
    failed ParseStatus and the chain moves on); command failures keep the
    row with ``ext_error`` set so the crawl can count them.
    """
    import pandas as pd

    runner = run_command or subprocess_command_fn()
    src = fetch_log.select(
        F.col(url).alias("url"),
        F.col(content).alias("content"),
        F.col(content_type).alias("content_type"),
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for u, c, ctype in zip(pdf["url"], pdf["content"], pdf["content_type"]):
                cmd = type_commands.get(ctype)
                if cmd is None or c is None:
                    continue
                payload = bytes(c) if not isinstance(c, str) else c.encode(encoding)
                try:
                    out = runner(list(cmd), payload)
                    rows.append(
                        {
                            "url": u,
                            "parse_text": out.decode(encoding, errors="replace").strip(),
                            "ext_error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-row containment
                    rows.append(
                        {"url": u, "parse_text": "", "ext_error": type(e).__name__}
                    )
            yield pd.DataFrame(rows, columns=["url", "parse_text", "ext_error"])

    return src.mapInPandas(gen, EXT_PARSE_SCHEMA)
