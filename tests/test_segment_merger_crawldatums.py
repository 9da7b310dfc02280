"""Port of the reference's TestSegmentMergerCrawlDatums.java
(/root/reference/src/test/org/apache/nutch/segment/
TestSegmentMergerCrawlDatums.java:85-226) — the "disappearing records /
wrong status" regression matrix behind NUTCH-1113, NUTCH-1520 and
NUTCH-1616, driven against operators/merge.py merge_segments.

Scenario encoding mirrors createSegment(:379-436): a segment may contain,
for the MAIN url, a ``linked`` carrier row (redirect injection), a real
fetch-status row, or both; a separate redirecting url carries
``fetch_redir_temp``. The merged segment's fetch status for the main url
must be the NEWEST real fetch status — never clobbered by newer ``linked``
/ ``fetch_retry`` / ``fetch_notmodified`` rows.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.merge import merge_segments

URL = "http://nutch.apache.org/"
REDIR_URL = "http://nutch.apache.org/i_redirect_to_the_root/"

ALL_FETCH = [
    "fetch_success",
    "fetch_gone",
    "fetch_redir_temp",
    "fetch_redir_perm",
    "fetch_retry",
    "fetch_notmodified",
]


def _segment(spark, seg_id: str, status: str, fetch: bool = True, redirect: bool = False):
    rows = []
    if redirect:  # main url as a 'linked' carrier (createSegment:406-412)
        rows.append((URL, "linked", seg_id))
    if fetch:
        rows.append((URL, status, seg_id))
    if redirect:
        rows.append((REDIR_URL, "fetch_redir_temp", seg_id))
    return spark.createDataFrame(rows, "url string, status string, segment_id string")


def _merged_status(spark, parts) -> str | None:
    out = merge_segments(parts, key="url", segment="segment_id")
    rows = out.filter(
        (F.col("url") == URL) & F.col("status").startswith("fetch_")
    ).collect()
    assert len(rows) <= 1
    return rows[0]["status"] if rows else None


def _execute_sequence(
    spark, first: str, last: str, rounds: int, redirect: bool, rng: random.Random
) -> str:
    """executeSequence(:245-291): first/last fixed, random middle."""
    parts = [_segment(spark, "0000000", first)]
    for i in range(1, rounds - 1):
        status = rng.choice(ALL_FETCH)
        add_redirect = rng.random() < 0.5 if redirect else False
        add_fetch = (rng.random() < 0.5) if add_redirect else True
        parts.append(
            _segment(spark, f"{i:07d}", status, fetch=add_fetch, redirect=add_redirect)
        )
    parts.append(
        _segment(
            spark,
            f"{rounds - 1:07d}",
            last,
            fetch=True,
            redirect=(rng.random() < 0.5 if redirect else False),
        )
    )
    return _merged_status(spark, parts)


def test_single_random_sequence(spark):
    """testSingleRandomSequence (256 rounds scaled to 24: the semantics are
    per-row, the reference's 256 only stresses MapFile I/O)."""
    rng = random.Random(1113)
    assert (
        _execute_sequence(spark, "fetch_gone", "fetch_success", 24, False, rng)
        == "fetch_success"
    )


def test_mostly_redirects(spark):
    """testMostlyRedirects: 7 redirect-only segments + 1 real fetch (the
    OLDEST segment!) — the real status must survive every newer 'linked'."""
    parts = [
        _segment(spark, ts, "fetch_success", fetch=False, redirect=True)
        for ts in (
            "20140110114943", "20140110114832", "20140110114558",
            "20140110114930", "20140110114545", "20140110114903",
            "20140110114724",
        )
    ]
    parts.append(_segment(spark, "20140110114507", "fetch_success", fetch=True))
    assert _merged_status(spark, parts) == "fetch_success"


_SEQ_SEEDS = {
    "fetch_success": 1616,
    "fetch_gone": 1617,
    "fetch_redir_temp": 1618,
    "fetch_redir_perm": 1619,
}


@pytest.mark.parametrize("expected", sorted(_SEQ_SEEDS))
def test_randomized_sequences(spark, expected):
    """testRandomizedSequences: any real expected status (retry/notmodified
    excluded like the reference:131-156) survives a random middle.  Fixed
    per-parameter seeds — Python's salted str hash would make a failing
    sequence unreproducible across runs."""
    rng = random.Random(_SEQ_SEEDS[expected])
    first = rng.choice(["fetch_success", "fetch_gone"])
    assert _execute_sequence(spark, first, expected, 12, False, rng) == expected


def test_random_sequence_with_redirects(spark):
    """testRandomTestSequenceWithRedirects (128 rounds scaled to 24)."""
    rng = random.Random(1520)
    assert (
        _execute_sequence(spark, "fetch_gone", "fetch_success", 24, True, rng)
        == "fetch_success"
    )


def test_fixed_sequence(spark):
    """testFixedSequence: GONE(fetch), GONE(redirect-only), SUCCESS(fetch)."""
    parts = [
        _segment(spark, "00001", "fetch_gone", fetch=True),
        _segment(spark, "00002", "fetch_gone", fetch=False, redirect=True),
        _segment(spark, "00003", "fetch_success", fetch=True),
    ]
    assert _merged_status(spark, parts) == "fetch_success"


def test_redir_fetch_in_one_segment(spark):
    """testRedirFetchInOneSegment: fetch datum preferred over the linked
    datum within a single segment."""
    parts = [_segment(spark, "00001", "fetch_success", fetch=True, redirect=True)]
    assert _merged_status(spark, parts) == "fetch_success"


def test_ends_with_redirect(spark):
    """testEndsWithRedirect: a NEWER redirect-only segment must not clobber
    the older real fetch_success (the NUTCH-1113 disappearing record)."""
    parts = [
        _segment(spark, "00001", "fetch_success", fetch=True),
        _segment(spark, "00002", "fetch_success", fetch=False, redirect=True),
    ]
    assert _merged_status(spark, parts) == "fetch_success"


def test_redirecting_url_kept(spark):
    """The redirecting url's own fetch_redir_temp row must survive the
    merge alongside the main record."""
    parts = [
        _segment(spark, "00001", "fetch_success", fetch=True, redirect=True),
        _segment(spark, "00002", "fetch_gone", fetch=True),
    ]
    out = merge_segments(parts, key="url", segment="segment_id")
    redir = out.filter(F.col("url") == REDIR_URL).collect()
    assert len(redir) == 1 and redir[0]["status"] == "fetch_redir_temp"
