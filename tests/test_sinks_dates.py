"""Sink round-trips (S3/S4/S5/S6) and the HTTP date-parsing cascade (§2.7)."""

from __future__ import annotations

import datetime
import glob

from pyspark.sql import functions as F

from nutch_spark.functions.dates import parse_http_date
from nutch_spark.sources.sinks import (
    register_sink,
    route_to_sinks,
    write_csv,
    write_jsonl,
    write_text_dump,
)


def db(spark):
    return spark.createDataFrame(
        [
            ("http://a.com/", "db_fetched", 2.5, b"\x01\xff", {"k": "v"}),
            ("http://b.com/", "db_gone", 0.0, None, {}),
        ],
        "url string, status string, score float, signature binary, "
        "metadata map<string,string>",
    )


def test_csv_round_trip(spark, tmp_path):
    path = str(tmp_path / "csv")
    write_csv(db(spark), path)
    # write_csv emits RFC 4180 (quotes escaped by doubling) — read with
    # the same dialect, as DuckDB/Excel/csv.reader would
    back = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    rows = {r["url"]: r for r in back.collect()}
    assert rows["http://a.com/"]["signature"] == "01ff"  # hex-encoded binary
    assert rows["http://a.com/"]["metadata"] == '{"k":"v"}'
    assert rows["http://b.com/"]["status"] == "db_gone"

    # the raw file bytes carry the doubled-quote dialect
    import glob

    raw = "".join(open(f).read() for f in glob.glob(f"{path}/*.csv"))
    assert '"{""k"":""v""}"' in raw


def test_jsonl_round_trip(spark, tmp_path):
    path = str(tmp_path / "json")
    write_jsonl(db(spark), path)
    back = spark.read.json(path)
    rows = {r["url"]: r for r in back.collect()}
    assert rows["http://a.com/"]["metadata"]["k"] == "v"
    assert rows["http://a.com/"]["score"] == 2.5


def test_text_dump_and_sink_routing(spark, tmp_path):
    path = str(tmp_path / "txt")
    write_text_dump(db(spark), path)
    text = "".join(open(f).read() for f in glob.glob(path + "/part-*"))
    assert "url: http://a.com/" in text and "signature: 01ff" in text

    seen: list[int] = []
    register_sink("probe", lambda d: seen.append(d.count()))
    route_to_sinks(db(spark), condition="status = 'db_fetched'")
    assert seen == [1]  # Exchange-style condition filtered to the ADD row


def test_http_date_cascade(spark):
    samples = [
        ("Sun, 06 Nov 1994 08:49:37 GMT", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        # single-digit day (TestHttpDateFormat.java:50-52)
        ("Sun, 6 Nov 1994 08:49:37 GMT", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        # RFC 850 two-digit year pivots to LAST century (SimpleDateFormat parity)
        ("Sunday, 06-Nov-94 08:49:37 GMT", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        # single-digit day (TestHttpDateFormat.java:50-52)
        ("Sun, 6 Nov 1994 08:49:37 GMT", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        # RFC 850 two-digit year pivots to LAST century (NUTCH parity)
        ("Sunday, 06-Nov-94 08:49:37 GMT", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        ("06 Nov 1994 08:49:37", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        ("1994/11/06 08:49:37", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        ("1994-11-06T08:49:37", datetime.datetime(1994, 11, 6, 8, 49, 37)),
        ("2021-03-04 10:11", datetime.datetime(2021, 3, 4, 10, 11)),
        ("06.11.1994", datetime.datetime(1994, 11, 6)),
        ("not a date", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], "raw string")
    got = {r["raw"]: r["ts"] for r in df.select("raw", parse_http_date("raw").alias("ts")).collect()}
    for raw, want in samples:
        assert got[raw] == want, f"{raw!r}: {got[raw]} != {want}"
