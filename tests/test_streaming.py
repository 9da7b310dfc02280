"""Structured Streaming surface tests (SURVEY.md §2.8 / §7 step 13).

The windowed/dedup plans are source-agnostic; the streaming path is driven
with an actual readStream (file source) into a memory sink, the batch path
with the same functions on a static frame.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nutch_spark.streaming import fetch_rate_windows, streaming_dedup

T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def fetch_rows():
    return [
        ("http://a.com/1", "fetch_success", T0, b"s1"),
        ("http://a.com/2", "fetch_gone", T0 + datetime.timedelta(minutes=1), None),
        ("http://b.com/1", "fetch_success", T0 + datetime.timedelta(minutes=2), b"s2"),
        ("http://a.com/1", "fetch_success", T0 + datetime.timedelta(minutes=3), b"s1"),  # dup
        ("http://a.com/3", "fetch_success", T0 + datetime.timedelta(minutes=15), b"s3"),
    ]


SCHEMA = "url string, status string, fetch_time timestamp, signature binary"


def test_fetch_rate_windows_batch(spark):
    log = spark.createDataFrame(fetch_rows(), SCHEMA)
    out = {(r["win_start"], r["host"]): r for r in fetch_rate_windows(log).collect()}
    first = (T0, "a.com")
    assert out[first]["pages"] == 3 and out[first]["errors"] == 1
    assert out[(T0, "b.com")]["pages"] == 1
    assert out[(T0 + datetime.timedelta(minutes=10), "a.com")]["pages"] == 1


def test_streaming_dedup_batch(spark):
    log = spark.createDataFrame(fetch_rows(), SCHEMA)
    out = streaming_dedup(log)
    assert out.count() == 4  # the repeated (url, signature) observation dropped


def test_windowed_agg_under_readstream(spark, tmp_path):
    # same plan, real streaming execution: file source → memory sink
    src = str(tmp_path / "in")
    log = spark.createDataFrame(fetch_rows(), SCHEMA)
    log.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(log.schema).parquet(src)
    assert stream.isStreaming
    q = (
        fetch_rate_windows(stream)
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rates").collect()
    # complete mode emits every window state (append would only emit
    # watermark-closed windows, and a single bounded batch closes none)
    rates = {(r["win_start"], r["host"]): r["pages"] for r in got}
    assert rates[(T0, "a.com")] == 3
    assert rates[(T0, "b.com")] == 1
    assert rates[(T0 + datetime.timedelta(minutes=10), "a.com")] == 1


def test_streaming_hostdb_batch(spark):
    from nutch_spark.streaming import streaming_hostdb

    log = spark.createDataFrame(fetch_rows(), SCHEMA)
    out = {r["host"]: r for r in streaming_hostdb(log).collect()}
    assert out["a.com"]["fetched"] == 3 and out["a.com"]["errors"] == 1
    assert out["b.com"]["fetched"] == 1 and out["b.com"]["errors"] == 0
    assert out["a.com"]["last_fetch"] == T0 + datetime.timedelta(minutes=15)


def test_streaming_hostdb_stateful(spark, tmp_path):
    # real streaming execution of the applyInPandasWithState path:
    # file source -> memory sink, availableNow
    from nutch_spark.streaming import streaming_hostdb

    src = str(tmp_path / "in_hostdb")
    log = spark.createDataFrame(fetch_rows(), SCHEMA)
    log.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(log.schema).parquet(src)
    q = (
        streaming_hostdb(stream)
        .writeStream.format("memory")
        .queryName("hostdb_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["host"]: r for r in spark.sql("select * from hostdb_state").collect()}
    assert rows["a.com"]["fetched"] == 3 and rows["a.com"]["errors"] == 1
    assert rows["b.com"]["fetched"] == 1


def test_session_windows_batch_and_stream(spark, tmp_path):
    from nutch_spark.streaming.continuous import session_windows

    rows = [
        ("u1", T0),
        ("u1", T0 + datetime.timedelta(minutes=10)),   # merges (gap 30m)
        ("u1", T0 + datetime.timedelta(minutes=50)),   # 40m later: new session
        ("u2", T0 + datetime.timedelta(minutes=5)),
    ]
    log = spark.createDataFrame(rows, "url string, fetch_time timestamp")
    out = session_windows(log, gap="30 minutes").collect()
    by = {(r["url"], r["session_start"]): r for r in out}
    assert len(by) == 3
    s1 = by[("u1", T0)]
    assert s1["n_events"] == 2
    assert s1["session_end"] == T0 + datetime.timedelta(minutes=40)  # last + gap
    assert by[("u1", T0 + datetime.timedelta(minutes=50))]["n_events"] == 1

    # real streaming execution with watermarked session state
    src = str(tmp_path / "sess_in")
    log.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(log.schema).parquet(src)
    q = (
        session_windows(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["url"], r["session_start"]) for r in spark.sql("select * from sessions").collect()}
    assert got == set(by)


def test_streaming_clean_end_to_end(spark, tmp_path):
    """The cleaning pipeline over a REAL readStream: quality gate, PII
    scrub, watermarked fingerprint dedup, benchmark-gram drop."""
    from nutch_spark.datapipe.dedup import shingles
    from nutch_spark.streaming import streaming_clean

    bench_text = " ".join(f"bench{i}" for i in range(15))
    good = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, good + " mail me at bob@example.com", T0),
        (2, good + " mail me at bob@example.com", T0 + datetime.timedelta(minutes=1)),  # dup of 1
        (3, "short text", T0),                                 # fails quality gate
        (4, "repeat " * 40, T0),                               # uniq ratio too low
        (5, f"lead {bench_text} tail " + good, T0),            # contaminated
        (6, " ".join(f"other{i}" for i in range(25)), T0),
    ]
    schema = "doc_id long, text string, ingest_time timestamp"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    bench = spark.createDataFrame([(bench_text,)], "text string")
    grams = [r["g"] for r in bench.select(
        F.explode(shingles(F.col("text"), 13)).alias("g")).collect()]

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_clean(stream, grams)
        .writeStream.format("memory")
        .queryName("clean_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["doc_id"]: r for r in spark.sql("SELECT * FROM clean_sink").collect()}
    assert set(out) == {1, 6} or set(out) == {2, 6}  # one of the dup pair
    survivor = out.get(1) or out.get(2)
    assert "<PII>" in survivor["clean_text"]          # email scrubbed
    assert "bob@example.com" not in survivor["clean_text"]
    assert out[6]["n_tokens"] == 25


def test_streaming_image_dedup_end_to_end(spark, tmp_path):
    """Perceptual image dedup over a REAL readStream: the same image in
    two different containers dedups to one survivor; distinct images and
    undecodable payloads pass through."""
    import struct as _struct
    import zlib as _zlib

    from nutch_spark.streaming import streaming_image_dedup

    def png_gray(grid):
        raw = bytearray()
        for line in grid:
            raw.append(0)
            raw += bytes(line)

        def chunk(tag, body):
            return (_struct.pack(">I", len(body)) + tag + body
                    + _struct.pack(">I", _zlib.crc32(tag + body)))

        w, h = len(grid[0]), len(grid)
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", _zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    def bmp_gray(grid):
        w, h = len(grid[0]), len(grid)
        data = bytearray()
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for g in grid[y]:
                row += bytes([g, g, g])
            row += b"\x00" * ((-len(row)) % 4)
            data += row
        return (b"BM" + _struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                + _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                               len(data), 0, 0, 0, 0) + bytes(data))

    a = [[(x * 31 + y * 7) % 211 for x in range(18)] for y in range(16)]
    b = [[(199 - x * 13 + y) % 211 for x in range(18)] for y in range(16)]
    rows = [
        (1, bytearray(png_gray(a)), T0),
        (2, bytearray(bmp_gray(a)), T0 + datetime.timedelta(minutes=1)),  # dup
        (3, bytearray(png_gray(b)), T0),                   # distinct image
        (4, bytearray(b"RIFFxxxxWEBPVP8 junk"), T0),       # undecodable
        (5, None, T0),                                     # missing payload
    ]
    schema = "media_id long, payload binary, ingest_time timestamp"
    src = str(tmp_path / "media_src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_image_dedup(stream)
        .writeStream.format("memory")
        .queryName("imgdedup_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["media_id"]: r for r in spark.sql("SELECT * FROM imgdedup_sink").collect()}
    survivors = set(out)
    assert 3 in survivors  # distinct image survives
    assert {4, 5} <= survivors  # undecodable rows pass through, NULL hash
    assert out[4]["dhash"] is None and out[5]["dhash"] is None
    assert len(survivors & {1, 2}) == 1  # the cross-container dup collapses
    kept = (survivors & {1, 2}).pop()
    assert out[kept]["dhash"] == out[3]["dhash"] or True  # hashes present
    assert out[kept]["dhash"] is not None and out[3]["dhash"] is not None
    assert out[kept]["dhash"] != out[3]["dhash"]


def test_streaming_video_dedup_end_to_end(spark, tmp_path):
    """Clip dedup over a REAL readStream: the same clip re-containered
    (AVI vs animated GIF vs QuickTime/MOV) dedups to one survivor;
    distinct clips and non-video payloads pass through."""
    from nutch_spark.plans.datapipe_queries import (
        _planted_animated_gif,
        _planted_avi,
        _planted_mov,
    )
    from nutch_spark.streaming import streaming_video_dedup

    rows = [
        (1, bytearray(_planted_avi(13)), T0),
        (2, bytearray(_planted_animated_gif(13)),
         T0 + datetime.timedelta(minutes=1)),               # same clip, GIF
        (3, bytearray(_planted_mov(13)),
         T0 + datetime.timedelta(minutes=2)),               # same clip, MOV
        (4, bytearray(_planted_avi(14)), T0),               # distinct clip
        (5, bytearray(b"not a video at all"), T0),          # non-video
        (6, None, T0),                                      # missing payload
    ]
    schema = "media_id long, payload binary, ingest_time timestamp"
    src = str(tmp_path / "video_src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_video_dedup(stream)
        .writeStream.format("memory")
        .queryName("viddedup_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["media_id"]: r for r in
           spark.sql("SELECT * FROM viddedup_sink").collect()}
    survivors = set(out)
    # exactly ONE of the three same-clip containers survives
    assert len(survivors & {1, 2, 3}) == 1
    kept = (survivors & {1, 2, 3}).pop()
    assert out[kept]["n_frames"] == 2 and out[kept]["video_sig"] is not None
    assert 4 in survivors and out[4]["video_sig"] != out[kept]["video_sig"]
    # non-video and NULL payloads pass through with NULL signatures
    assert 5 in survivors and out[5]["video_sig"] is None
    assert 6 in survivors and out[6]["video_sig"] is None


def test_fetch_parse_join_batch_and_stream(spark, tmp_path):
    """fetch_parse_join: batch path matches the hand-computed interval
    join; the IDENTICAL plan executes as a real stream-stream join under
    readStream (both sides watermarked — Spark rejects unbounded
    stream-stream state outright, so a successful run proves the state
    bound)."""
    from nutch_spark.streaming import fetch_parse_join

    f_rows = [
        ("u1", T0, "fetch_success"),
        ("u2", T0 + datetime.timedelta(minutes=5), "fetch_success"),
        ("u3", T0, "fetch_gone"),
    ]
    p_rows = [
        ("u1", T0 + datetime.timedelta(minutes=10), 4),   # in window
        ("u1", T0 + datetime.timedelta(minutes=40), 9),   # past max_delay
        ("u2", T0 + datetime.timedelta(minutes=4), 2),    # BEFORE fetch
        ("u2", T0 + datetime.timedelta(minutes=6), 3),    # in window
        ("ux", T0, 1),                                     # no fetch twin
    ]
    F_SCHEMA = "url string, fetch_time timestamp, status string"
    P_SCHEMA = "url string, parse_time timestamp, n_outlinks int"
    f = spark.createDataFrame(f_rows, F_SCHEMA)
    p = spark.createDataFrame(p_rows, P_SCHEMA)
    got = {
        (r["url"], r["parse_lag_s"], r["n_outlinks"])
        for r in fetch_parse_join(f, p, max_delay_s=1800).collect()
    }
    assert got == {("u1", 600, 4), ("u2", 60, 3)}

    # real streaming execution: two file sources -> memory sink
    fdir, pdir = str(tmp_path / "f"), str(tmp_path / "p")
    f.coalesce(1).write.mode("overwrite").parquet(fdir)
    p.coalesce(1).write.mode("overwrite").parquet(pdir)
    fs = spark.readStream.schema(f.schema).parquet(fdir)
    ps = spark.readStream.schema(p.schema).parquet(pdir)
    assert fs.isStreaming and ps.isStreaming
    q = (
        fetch_parse_join(fs, ps, watermark="1 minute", max_delay_s=1800)
        .writeStream.format("memory")
        .queryName("fpj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["url"], r["parse_lag_s"], r["n_outlinks"])
        for r in spark.sql("SELECT * FROM fpj").collect()
    }
    assert streamed == got


def test_streaming_embed_dedup_end_to_end(spark, tmp_path):
    """Embedding-space text dedup over a REAL readStream: exact AND
    reordered copies collapse (identical token multisets → identical
    quantized-vector digests), distinct texts survive, zero-token rows
    pass through individually; the stream's digest rule matches the
    batch featurizer bit-for-bit."""
    from nutch_spark.datapipe.similarity import hashed_embedding
    from nutch_spark.streaming.continuous import streaming_embed_dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", T0),
        (2, "the quick brown fox jumps over the lazy dog", T0),  # exact dup
        (6, "dog lazy the over jumps fox brown quick the", T0),  # reordered
        (3, "an entirely different document about spark plans", T0),
        (4, "", T0),          # zero tokens: passes through
        (5, "", T0),          # ...and does NOT match the other empty row
        (7, "w0 w292", T0),   # tokens CANCEL to the zero vector...
        (8, "w1 w55", T0),    # ...a distinct zero-norm doc must ALSO pass
    ]
    schema = "doc_id long, text string, ingest_time timestamp"
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_embed_dedup(stream)
        .writeStream.format("memory")
        .queryName("embdedup_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["doc_id"] for r in spark.sql("SELECT * FROM embdedup_sink").collect()}
    assert 3 in out
    assert {4, 5} <= out                 # empties keyed by doc_id, both kept
    assert {7, 8} <= out                 # zero-NORM docs keyed by doc_id too
    assert len(out & {1, 2, 6}) == 1     # exact + REORDERED copies collapsed
    # the stream's digest rule IS the batch featurizer's: the token
    # MULTISET determines the vector, order never does
    emb = {r["doc_id"]: r["embedding"]
           for r in hashed_embedding(
               spark.createDataFrame(rows, schema).select("doc_id", "text")
           ).collect()}
    assert emb[1] == emb[2] == emb[6] and emb[1] != emb[3]


def test_streaming_image_near_dup_banded(spark, tmp_path):
    """Banded near-dup over a REAL readStream (r16): within-watermark
    near-copies (hamming <= max_hamming) surface in the dup-evidence
    stream naming the earlier representative; band-spread differences,
    genuinely distinct hashes, and cross-watermark arrivals survive.
    Two micro-batches (maxFilesPerTrigger=1) so the watermark actually
    advances between them. hash_fn injection plants exact hash values so
    every hamming distance is closed-form."""
    import struct as _struct

    from nutch_spark.streaming import streaming_image_near_dup

    def payload(h: int) -> bytearray:
        return bytearray(_struct.pack(">Q", h))

    def hash_fn(raw: bytes) -> int:
        return int.from_bytes(raw[:8], "big")

    H1 = 0x0123_4567_89AB_CDEF
    rows1 = [
        (1, payload(H1), T0),
        # 3 flipped bits, all inside band 0 -> bands 1-3 identical: dup
        (2, payload(H1 ^ 0b111), T0 + datetime.timedelta(minutes=1)),
        # 1 flipped bit per band -> NO identical band, hamming 4: survivor
        (3, payload(H1 ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))),
         T0 + datetime.timedelta(minutes=1)),
        # unrelated hash: survivor
        (4, payload(0xFEDC_BA98_0011_2233), T0),
        # exact copy: dup at hamming 0
        (5, payload(H1), T0 + datetime.timedelta(minutes=2)),
        # undecodable (NULL hash): passes through the banding untouched
        (6, None, T0),
    ]
    # batch 2, past the 10-minute horizon: 1 bit from H1 but every claim
    # of batch 1 is out of join range AND evicted -> survivor
    rows2 = [
        (7, payload(H1 ^ 1), T0 + datetime.timedelta(minutes=40)),
    ]
    schema = "media_id long, payload binary, ingest_time timestamp"
    src = str(tmp_path / "neardup_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_image_near_dup(stream, hash_fn=hash_fn)
        .writeStream.format("memory")
        .queryName("neardup_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM neardup_sink").collect()
    # evidence may repeat per agreeing band: aggregate to (id -> verdicts)
    verdicts: dict[int, set[tuple[int, int]]] = {}
    for r in out:
        verdicts.setdefault(r["media_id"], set()).add((r["dup_of"], r["hamming"]))
    assert set(verdicts) == {2, 5}, verdicts
    # dup_of names SOME earlier near-dup family member; direction
    # (later = dup) is deterministic, the per-band representative is
    # not: id 2 (+1m) can only name id 1 (T0); id 5 (+2m) is an exact
    # copy of 1 (always surfaces at hamming 0 through the unshared
    # band-0 key) and hamming-3 from 2
    assert verdicts[2] == {(1, 3)}, verdicts
    assert (1, 0) in verdicts[5] and verdicts[5] <= {(1, 0), (2, 3)}, verdicts


def test_streaming_image_near_dup_real_decode(spark, tmp_path):
    """The same operator over REAL pixels: a PNG and its one-pixel-nudged
    variant hash within the radius and the later arrival is flagged as a
    near-dup of the earlier one."""
    import struct as _struct
    import zlib as _zlib

    from nutch_spark.datapipe.mediacodec import dhash64
    from nutch_spark.streaming import streaming_image_near_dup

    def png_gray(grid):
        raw = bytearray()
        for line in grid:
            raw.append(0)
            raw += bytes(line)

        def chunk(tag, body):
            return (_struct.pack(">I", len(body)) + tag + body
                    + _struct.pack(">I", _zlib.crc32(tag + body)))

        w, h = len(grid[0]), len(grid)
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", _zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    a = [[(x * 31 + y * 7) % 211 for x in range(18)] for y in range(16)]
    a2 = [row[:] for row in a]
    a2[0][0] = (a2[0][0] + 60) % 211  # one-pixel nudge
    pa, pa2 = png_gray(a), png_gray(a2)
    d = bin(dhash64(pa) ^ dhash64(pa2)).count("1")
    assert d <= 3, f"precondition: planted nudge drifted {d} bits"

    rows = [
        (1, bytearray(pa), T0),
        (2, bytearray(pa2), T0 + datetime.timedelta(minutes=1)),
    ]
    schema = "media_id long, payload binary, ingest_time timestamp"
    src = str(tmp_path / "neardup_px_src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    q = (
        streaming_image_near_dup(
            spark.readStream.schema(schema).parquet(src)
        )
        .writeStream.format("memory")
        .queryName("neardup_px_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM neardup_px_sink").collect()
    assert {(r["media_id"], r["dup_of"]) for r in out} == {(2, 1)}
    assert all(r["hamming"] == d for r in out)


def test_streaming_image_near_dup_flood_linear(spark, tmp_path):
    """Flood pin (the r15 scale-caps lesson, streaming form): 120
    same-hash copies plus near-copies must emit evidence LINEAR in the
    flood size — each copy matches only the per-band claimant (at most
    `bands` rows each), never the O(k^2) member pairs of batch pair
    mode. State stays one row per distinct band key."""
    import struct as _struct

    from nutch_spark.streaming import streaming_image_near_dup

    def payload(h: int) -> bytearray:
        return bytearray(_struct.pack(">Q", h))

    def hash_fn(raw: bytes) -> int:
        return int.from_bytes(raw[:8], "big")

    H = 0x5555_AAAA_3333_CCCC
    n_copies = 120
    # micro-batch 1: the anchor plus unrelated background images —
    # golden-ratio-spread hashes are pairwise distant (hamming ~32), so
    # even a coincidental band match fails the verify
    batch1 = [(1, payload(H), T0)] + [
        (1000 + i, payload((0x9E3779B97F4A7C15 * (i + 7)) & ((1 << 64) - 1)), T0)
        for i in range(20)
    ]
    # micro-batch 2: the flood — exact copies and hamming-2 variants,
    # all within the watermark of the anchor's claims
    batch2 = [
        (i, payload(H if i % 3 else H ^ 0b11),
         T0 + datetime.timedelta(seconds=i))
        for i in range(2, n_copies + 2)
    ]
    schema = "media_id long, payload binary, ingest_time timestamp"
    src = str(tmp_path / "flood_src")
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    q = (
        streaming_image_near_dup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            hash_fn=hash_fn,
        )
        .writeStream.format("memory")
        .queryName("flood_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM flood_sink").collect()
    # LINEAR: every flood member emits at most `bands` rows per rep
    # family (anchor + at most one new claimant per variant band key) —
    # never the O(k^2) member pairs a batch pair-mode would
    assert 0 < len(out) <= 4 * 2 * (n_copies + 1), len(out)
    flagged = {r["media_id"] for r in out}
    assert not flagged & {1000 + i for i in range(20)}  # background clean
    # the anchor claimed its bands in batch 1, so EVERY flood member
    # (hamming 0 or 2 from it) is within radius of a standing claim
    assert set(range(2, n_copies + 2)) <= flagged, sorted(
        set(range(2, n_copies + 2)) - flagged
    )[:10]
