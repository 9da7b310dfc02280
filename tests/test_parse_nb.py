"""parsefilter-naivebayes: training math, classification, outlink pruning.

Hand-computed expectations mirror Train.java:55-120 / Classify.java:47-110
(including the literal ``log(freq)+1`` term and relevant-on-tie)."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from nutch_spark.operators.parse_nb import (
    naive_bayes_parse_filter,
    nb_classify,
    read_trainfile,
    train_nb_model,
)

Q = 1_000_000


def _q(x):
    return math.floor(x * Q + 0.5)


def _train(spark):
    return train_nb_model(
        spark.createDataFrame(
            [
                Row(label=1, text="good data good"),
                Row(label=0, text="bad spam"),
            ]
        )
    )


def test_train_weights_match_reference_formula(spark):
    m = _train(spark)
    # vocab = {good, data, bad, spam} -> V=4; numwords_r=3, numwords_ir=2
    w = {r["word"]: r for r in m.words.collect()}
    assert set(w) == {"good", "data", "bad", "spam"}
    denom_r = math.log(3 + 4)
    denom_ir = math.log(2 + 4)
    # seen in class: log(freq) + 1 - log(numwords + V)  (Classify.java:90-97)
    assert w["good"]["w_r"] == _q(math.log(2) + 1 - denom_r)
    assert w["data"]["w_r"] == _q(math.log(1) + 1 - denom_r)
    assert w["bad"]["w_ir"] == _q(math.log(1) + 1 - denom_ir)
    # unseen in class: 1 - log(numwords + V)
    assert w["good"]["w_ir"] == _q(1 - denom_ir) == m.default_ir
    assert w["bad"]["w_r"] == _q(1 - denom_r) == m.default_r
    # priors: log(numof_c) - log(total)
    assert m.prior_r == _q(math.log(1) - math.log(2))
    assert m.prior_ir == _q(math.log(1) - math.log(2))


def test_classify_decisions(spark):
    m = _train(spark)
    docs = spark.createDataFrame(
        [
            Row(url="a", text="good data!!"),  # tokenizer strips punctuation
            Row(url="b", text="BAD spam"),  # lowercased before lookup
            Row(url="c", text=""),  # priors only -> tie -> relevant
            # all-unseen: default weight 1-log(numwords_c+V) favors the class
            # with FEWER training words (here irrelevant: 1-ln6 > 1-ln7) —
            # a quirk of Classify.java:93-99 faithfully kept
            Row(url="d", text="zzz unknown"),
        ]
    )
    out = {r["url"]: r["relevant"] for r in nb_classify(docs, m).collect()}
    assert out == {"a": True, "b": False, "c": True, "d": False}


def test_irrelevant_page_keeps_only_wordlist_outlinks(spark):
    m = _train(spark)
    parsed = spark.createDataFrame(
        [
            Row(
                url="http://s/rel",
                parse_text="good data",
                outlinks=[
                    Row(to_url="http://x/1", anchor="a"),
                    Row(to_url="http://x/2", anchor="b"),
                ],
            ),
            Row(
                url="http://s/irr",
                parse_text="bad spam bad",
                outlinks=[
                    Row(to_url="http://x/archive/1", anchor="a"),
                    Row(to_url="http://x/other", anchor="b"),
                ],
            ),
        ]
    )
    out = {
        r["url"]: r
        for r in naive_bayes_parse_filter(
            parsed, m, wordlist=["archive", "library"]
        ).collect()
    }
    rel, irr = out["http://s/rel"], out["http://s/irr"]
    assert rel["nb_relevant"] and len(rel["outlinks"]) == 2
    assert not irr["nb_relevant"]
    # second chance: only the wordlist-matching outlink survives
    assert [o["to_url"] for o in irr["outlinks"]] == ["http://x/archive/1"]


def test_read_trainfile_format(spark, tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("1\trelevant text here\n0\tspammy text\nnot-a-line\n")
    rows = {r["label"]: r["text"] for r in read_trainfile(spark, str(p)).collect()}
    assert rows == {1: "relevant text here", 0: "spammy text"}


def test_classification_is_integer_deterministic(spark):
    # identical inputs through different partitioning produce identical sums
    m = _train(spark)
    docs = spark.createDataFrame(
        [Row(url=f"u{i}", text="good data bad " * (i % 5 + 1)) for i in range(40)]
    )
    a = {r["url"]: r["relevant"] for r in nb_classify(docs, m).collect()}
    b = {
        r["url"]: r["relevant"]
        for r in nb_classify(docs.repartition(13), m).collect()
    }
    assert a == b
