"""BM25 retrieval, DSIR importance weights, and Gopher quality rules
(the round-6 LLM-pipeline additions)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nutch_spark.datapipe.retrieval import bm25_topk, dsir_log_ratio_weights, postings
from nutch_spark.datapipe.textstats import gopher_quality

DOCS = [
    (0, "spark merge spark merge merge window"),
    (1, "merge table scan"),
    (2, "window window window table scan row"),
    (3, "completely unrelated tokens about nothing"),
    (4, "merge"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_postings_tf_and_dl(docs):
    rows = {
        (r.term, r.doc_id): (r.tf, r.dl)
        for r in postings(docs).collect()
    }
    assert rows[("merge", 0)] == (3, 6)
    assert rows[("merge", 4)] == (1, 1)
    assert rows[("window", 2)] == (3, 6)
    assert ("nothing", 3) in rows


def test_bm25_matches_hand_formula(docs):
    got = {r.doc_id: r.bm25_q for r in bm25_topk(docs, ["merge"], k=10).collect()}
    n_docs, avgdl = 5, (6 + 3 + 6 + 5 + 1) / 5
    df = 3  # docs 0, 1, 4 contain "merge"
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        norm = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        return math.floor(idf * norm * 1e6 + 0.5)

    assert got == {0: score(3, 6), 1: score(1, 3), 4: score(1, 1)}
    # shortest doc with the term beats longer docs at equal tf
    assert got[4] > got[1]


def test_bm25_rank_is_deterministic_and_k_bounded(docs):
    out = bm25_topk(docs, ["merge", "window"], k=2).collect()
    assert [r.rank for r in out] == [1, 2]
    assert len(out) == 2
    # multi-term scores sum: doc 0 has merge(3) + window(1)
    full = {r.doc_id: r.bm25_q for r in bm25_topk(docs, ["merge", "window"], k=10).collect()}
    merge_only = {r.doc_id: r.bm25_q for r in bm25_topk(docs, ["merge"], k=10).collect()}
    win_only = {r.doc_id: r.bm25_q for r in bm25_topk(docs, ["window"], k=10).collect()}
    assert full[0] == merge_only[0] + win_only[0]


def test_dsir_weights_prefer_target_like_docs(spark):
    # target distribution: "alpha beta" bigrams; raw corpus has target-like
    # and off-distribution docs
    raw = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta alpha beta"),
            (1, "gamma delta gamma delta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "x"),  # < 2 tokens: no grams
        ],
        "doc_id long, text string",
    )
    # a strong target signal so target-like grams are RELATIVELY more
    # frequent in the target than in the raw mix despite add-one smoothing
    target = spark.createDataFrame(
        [(100, ("alpha beta " * 10).strip())], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dsir_log_ratio_weights(raw, target, buckets=64).collect()}
    assert out[0].selected and out[0].lr_q_sum > 0
    assert not out[1].selected and out[1].lr_q_sum < 0
    assert out[3].n_grams == 0 and out[3].lr_q_sum == 0 and not out[3].selected
    # mixed doc sits between the pure ones
    assert out[1].lr_q_sum < out[2].lr_q_sum < out[0].lr_q_sum


def test_gopher_quality_rules(spark):
    passing = (
        "the data be to of and that have with pipeline " * 6
    ).strip()  # 60 words, all alpha, stopwords present
    bullets = "\n".join("- item one two" for _ in range(10)) + "\nplain line"
    ellipsis = "\n".join("to be continued..." for _ in range(5)) + "\nthe end"
    symbols = " # ".join(["word"] * 60)
    short = "the of tiny"
    df = spark.createDataFrame(
        [
            (0, passing),
            (1, bullets),
            (2, ellipsis),
            (3, symbols),
            (4, short),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert out[0].passes_gopher_quality
    assert out[0].gopher_stopword_hits >= 2
    # bullets: 10/11 lines bulleted > 0.9
    assert out[1].frac_bullet_lines > 0.9 and not out[1].passes_gopher_quality
    # ellipsis: 5/6 lines > 0.3
    assert out[2].frac_ellipsis_lines > 0.3 and not out[2].passes_gopher_quality
    # symbols: 59 '#' over 119 words > 0.1, and alpha fraction < 0.8
    assert out[3].symbol_ratio > 0.1 and out[3].frac_alpha_words < 0.8
    assert not out[3].passes_gopher_quality
    assert out[4].n_words < 50 and not out[4].passes_gopher_quality


def test_gopher_quality_unicode_bullets_and_ellipsis(spark):
    df = spark.createDataFrame(
        [(0, "• punkt eins\n• punkt zwei\nund dann…")],
        "doc_id long, text string",
    )
    r = gopher_quality(df).collect()[0]
    assert r.frac_bullet_lines == pytest.approx(2 / 3)
    assert r.frac_ellipsis_lines == pytest.approx(1 / 3)
