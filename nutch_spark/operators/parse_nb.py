"""parsefilter-naivebayes — focused-crawl relevance filter.

Reference: src/plugin/parsefilter-naivebayes/src/java/org/apache/nutch/
parsefilter/naivebayes/{NaiveBayesParseFilter,Train,Classify}.java.

The reference trains a two-class (0=irrelevant, 1=relevant) naive-Bayes text
model from a driver-local ``label\\ttext`` file (Train.java:55-120), then, per
parsed page, classifies the extracted text (Classify.java:47-110); pages found
irrelevant keep only outlinks whose URL contains a word from a second-chance
wordlist (NaiveBayesParseFilter.filter:155-195).

Spark-first re-expression:

- **Training is one DataFrame aggregation pass** (explode tokens → word×class
  counts + class totals), not a driver loop: at 100 TB a labeled seed can be
  millions of rows. The finished model is small by construction (a vocab) and
  is broadcast for classification.
- **Classification is a broadcast left join + sum**, never a per-row Python
  UDF: ``explode_outer(tokens) → join broadcast(model) → groupBy(id).sum``.
  One shuffle (the groupBy), with map-side partial aggregation.
- **Weights are integer-quantized** at model-build time
  (``floor(x*1e6 + 0.5)`` of the reference's log weights). Sums of integers
  are associative, so the decision is bit-deterministic under any partitioning
  / aggregation order, and a DuckDB oracle can replay the identical pipeline.
  The decision can differ from the reference's double arithmetic only for
  scores tied within 1e-6 log-units per token.

Faithfully kept reference quirks: the ``log(freq) + 1`` weight term (NOT
``log(freq+1)`` — Classify.java:90-97 literally adds 1 outside the log), the
``[^a-zA-Z ]`` strip-then-lowercase tokenizer, and ties classifying as
relevant (only ``prob_ir > prob_r`` flips to 0, Classify.java:105-108).
Deliberate deviation: empty tokens from Java's ``split(" ")`` artifacts
(consecutive spaces) are dropped in BOTH train and classify — the reference
skips them in the frequency map but double-counts them in ``numwords`` and the
vocabulary, a split() artifact with no semantic content.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "NBModel",
    "nb_tokens",
    "train_nb_model",
    "nb_classify",
    "naive_bayes_parse_filter",
    "read_trainfile",
]

# log-weight quantization: 1e-6 log-units per integer step
_Q = 1_000_000


def _q(x: float) -> int:
    """floor(x*1e6 + 0.5) — identical rounding on every engine/platform."""
    return math.floor(x * _Q + 0.5)


def nb_tokens(col: Column | str) -> Column:
    """The reference tokenizer (Train.java:76 / Classify.java:54):
    strip everything but letters and spaces, lowercase, split on ' ';
    empty tokens dropped (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.regexp_replace(c, "[^a-zA-Z ]", "")), " "),
        lambda w: w != "",
    )


@dataclass(frozen=True)
class NBModel:
    """Broadcastable two-class model: per-word integer log-weights plus the
    class constants (Train.java's model-file scalars, pre-quantized)."""

    words: DataFrame  # word, w_ir: long, w_r: long
    default_ir: int  # weight of an unseen word under class 0
    default_r: int  # ... under class 1
    prior_ir: int  # log(numof_ir) - log(numof_ir + numof_r), quantized
    prior_r: int


def train_nb_model(
    labeled: DataFrame, *, label_col: str = "label", text_col: str = "text"
) -> NBModel:
    """One aggregation pass over ``labeled`` (label: int 0/1, text: string) →
    NBModel.  Mirrors Train.start (Train.java:55-120): per-class example
    counts, per-class token totals, vocabulary size, per-word per-class
    frequency; weights per Classify.java:90-103.

    Scale shape: explode + two hash aggregations (word×class, then class
    totals via the same pass's grouping sets would fork the plan — the class
    totals come from the word×class aggregate, which is already tiny).
    The only collect is the scalar row of class constants; the per-word
    weight table stays a DataFrame for broadcast."""
    lab = F.col(label_col).cast("int")
    toks = labeled.select(
        lab.alias("label"), F.explode(nb_tokens(text_col)).alias("word")
    )
    # word × class frequencies — the one big shuffle, map-side combined
    wc = toks.groupBy("word").agg(
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("f_ir"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("f_r"),
    )
    wc = wc.persist()  # released below once the weight table materializes
    # class scalars: derived from the (small) word×class aggregate + doc counts
    totals = wc.agg(
        F.coalesce(F.sum("f_ir"), F.lit(0)).alias("numwords_ir"),
        F.coalesce(F.sum("f_r"), F.lit(0)).alias("numwords_r"),
        F.count("*").alias("vocab"),
    ).first()
    docs = labeled.agg(
        F.sum(F.when(lab == 0, 1).otherwise(0)).alias("numof_ir"),
        F.sum(F.when(lab == 1, 1).otherwise(0)).alias("numof_r"),
    ).first()
    v = totals["vocab"]
    denom_ir = math.log(totals["numwords_ir"] + v)
    denom_r = math.log(totals["numwords_r"] + v)
    n_ir, n_r = docs["numof_ir"] or 0, docs["numof_r"] or 0
    log_total = math.log(n_ir + n_r)
    # per-word quantized weights: log(freq)+1-log(numwords+V) when freq>0
    # (the reference's literal formula), else the class default
    words = wc.select(
        "word",
        F.when(
            F.col("f_ir") > 0,
            F.floor(
                (F.log(F.col("f_ir").cast("double")) + 1.0 - denom_ir) * _Q + 0.5
            ),
        )
        .otherwise(F.lit(_q(1.0 - denom_ir)))
        .cast("long")
        .alias("w_ir"),
        F.when(
            F.col("f_r") > 0,
            F.floor(
                (F.log(F.col("f_r").cast("double")) + 1.0 - denom_r) * _Q + 0.5
            ),
        )
        .otherwise(F.lit(_q(1.0 - denom_r)))
        .cast("long")
        .alias("w_r"),
    )
    words = words.localCheckpoint(eager=True)  # materialize the model...
    wc.unpersist()  # ...then release the intermediate cache pin
    return NBModel(
        words=words,
        default_ir=_q(1.0 - denom_ir),
        default_r=_q(1.0 - denom_r),
        prior_ir=_q(math.log(n_ir) - log_total) if n_ir else _q(-1e9),
        prior_r=_q(math.log(n_r) - log_total) if n_r else _q(-1e9),
    )


def nb_classify(
    docs: DataFrame,
    model: NBModel,
    *,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """id, relevant:boolean — Classify.classify per row, as a broadcast join.

    explode_outer keeps token-free rows (their score is priors only —
    Classify.java still compares the priors for an empty line). The model
    join is broadcast (vocab ≪ corpus); the groupBy is the one shuffle."""
    toks = docs.select(
        F.col(id_col).alias("_nb_id"),
        F.explode_outer(nb_tokens(text_col)).alias("word"),
    )
    scored = (
        toks.join(F.broadcast(model.words), "word", "left")
        .groupBy("_nb_id")
        .agg(
            F.sum(
                F.when(F.col("word").isNull(), 0).otherwise(
                    F.coalesce(F.col("w_ir"), F.lit(model.default_ir))
                )
            ).alias("s_ir"),
            F.sum(
                F.when(F.col("word").isNull(), 0).otherwise(
                    F.coalesce(F.col("w_r"), F.lit(model.default_r))
                )
            ).alias("s_r"),
        )
    )
    # relevant unless prob_ir strictly exceeds prob_r (Classify.java:105-108)
    return scored.select(
        F.col("_nb_id").alias(id_col),
        (
            ~(
                (F.col("s_ir") + F.lit(model.prior_ir))
                > (F.col("s_r") + F.lit(model.prior_r))
            )
        ).alias("relevant"),
    )


def _contains_any(col: Column, words: list[str]) -> Column:
    """True when any wordlist entry is a substring of ``col``
    (NaiveBayesParseFilter.containsWord:97-105)."""
    if not words:
        return F.lit(False)
    out = F.lit(False)
    for w in words:
        out = out | F.contains(col, F.lit(w))
    return out


def naive_bayes_parse_filter(
    parsed: DataFrame,
    model: NBModel,
    wordlist: list[str],
    *,
    url_col: str = "url",
    text_col: str = "parse_text",
    outlinks_col: str = "outlinks",
) -> DataFrame:
    """The full HtmlParseFilter pass (NaiveBayesParseFilter.filter:155-195):
    classify each page's extracted text; an irrelevant page keeps only
    outlinks whose URL contains a second-chance wordlist word. Adds the
    ``nb_relevant`` boolean alongside the (possibly pruned) outlinks.

    One broadcast join + one shuffle (the classify groupBy) + one keyed join
    back to the parse rows; the outlink pruning itself is a map-only
    ``F.filter`` over the array column."""
    verdict = nb_classify(parsed, model, id_col=url_col, text_col=text_col)
    out = parsed.join(verdict, url_col, "left").withColumnRenamed(
        "relevant", "nb_relevant"
    )
    keep = F.when(
        F.coalesce(F.col("nb_relevant"), F.lit(True)),
        F.col(outlinks_col),
    ).otherwise(
        F.filter(
            F.col(outlinks_col),
            lambda o: _contains_any(o["to_url"], wordlist),
        )
    )
    return out.withColumn(outlinks_col, keep)


def read_trainfile(spark, path: str) -> DataFrame:
    """The reference's trainfile format (Train.java:70-75): one example per
    line, ``<label>\\t<text>`` with label 0 (irrelevant) or 1 (relevant)."""
    lines = spark.read.text(path)
    tab = F.instr(F.col("value"), "\t")
    return lines.where(tab > 0).select(
        F.substring(F.col("value"), 1, tab - 1).cast("int").alias("label"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
