"""Similarity search over an embedding column (ARRAY<FLOAT>).

- brute_force_topk: exact cosine top-k of each query vector against the
  corpus. The dot product is a zip_with/aggregate expression — JVM-side, no
  Python. Queries are broadcast (they are the small side by construction);
  the corpus is never shuffled. Per-partition top-k then global top-k via a
  ranking window on the (tiny) candidate set.
- lsh_topk: random-hyperplane LSH — corpus and queries are bucketed by sign
  patterns; only same-bucket pairs are scored. The 100 TB path: shuffle is
  O(rows) on bucket keys instead of a full cross product.
- embedding_near_dup_pairs: all corpus pairs above a cosine threshold via
  the same LSH bucketing.

Hyperplanes are generated from a seeded RNG on the driver (tiny: dim x bits
floats) and inlined as literals — effectively a broadcast.
"""

from __future__ import annotations

import math
import random
from decimal import ROUND_CEILING, Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ge_round_cut(threshold: float, scale: int) -> float:
    """Smallest double v for which ``round(v, scale) >= threshold`` under
    the rounding semantics Spark and DuckDB share for doubles: HALF_UP on
    the shortest-roundtrip decimal representation (Java
    ``BigDecimal(Double.toString(v))``; Python ``repr`` produces the same
    shortest decimal), followed by a double comparison of the result
    against the double ``threshold``.

    Because the shortest-repr decimal is strictly monotone in v, the whole
    round-then-compare decision collapses to ONE IEEE comparison
    ``v >= v_star`` — which lets a vectorized pair stage make the
    bit-identical keep/drop decision without rounding anything per pair
    (NaN handled separately: Spark orders NaN above every double, so
    ``round(NaN, s) >= t`` is true). Verified against Spark's ``round``
    over ulp-walks of every cut boundary in
    test_semantic_round_cut_matches_spark."""
    q = Decimal(1).scaleb(-scale)
    t = Decimal(repr(threshold))
    # g* = smallest rounding-grid multiple of 10^-scale whose double
    # value compares >= the double threshold
    g = (t / q).to_integral_value(rounding=ROUND_CEILING) * q
    while float(g - q) >= threshold:
        g -= q
    assert float(g) >= threshold and float(g - q) < threshold
    # HALF_UP boundary: decimal(v) >= g - q/2  <=>  v rounds to >= g*
    cut = g - q / 2
    v = float(cut)
    if Decimal(repr(v)) >= cut:
        while True:
            p = math.nextafter(v, -math.inf)
            if Decimal(repr(p)) >= cut:
                v = p
            else:
                break
    else:
        while Decimal(repr(v)) < cut:
            v = math.nextafter(v, math.inf)
    return v


def _cell_pair_dropper(threshold: float, round_sim: int):
    """Build the per-cell pandas function for semantic_dedup's within-cell
    pair sweep: emit the ids of rows with ANY earlier-ranked row whose
    rounded cosine clears ``threshold``.

    Bit-parity with the former zip_with/aggregate JVM form, term by term:
    the dot is a left fold over ascending element index (the loop below
    adds one double product per index, exactly ``acc + x_i * y_i`` in the
    fold's order), float inputs widen to double before the multiply
    (exact, as ``x.cast("double")``), the denominator multiplies the two
    prefolded norms once then divides once, and the round-then-compare
    decision is the single-compare form proven by :func:`_ge_round_cut`.
    Requires all vectors in a cell to share one dimension (the corpus
    contract; zip_with would null-pad instead)."""
    v_star = _ge_round_cut(threshold, round_sim)

    def dropped(pdf):
        import numpy as np
        import pandas as pd

        c = len(pdf)
        ids = pdf["id"].to_numpy()
        if c < 2:
            return pd.DataFrame({"id": ids[:0]})
        order = np.argsort(pdf["rn"].to_numpy(), kind="stable")
        ids = ids[order]
        V = np.vstack(pdf["v"].to_numpy()[order]).astype(np.float64)
        n = pdf["_n"].to_numpy(dtype=np.float64)[order]
        G = np.zeros((c, c), dtype=np.float64)
        for i in range(V.shape[1]):  # left fold over element index
            col = V[:, i]
            G += col[:, None] * col[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = G / (n[:, None] * n[None, :])
        hit = (cos >= v_star) | np.isnan(cos)  # NaN sorts above all doubles
        hit &= np.triu(np.ones((c, c), dtype=bool), 1)  # a ranked before b
        return pd.DataFrame({"id": ids[hit.any(axis=0)]})

    return dropped


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<FLOAT/DOUBLE> columns (double math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))
    return dot / (na * nb)


def hashed_embedding(
    corpus: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    *,
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing text embeddings (the hashing trick — Weinberger et
    al. 2009, public paper): every token contributes ±1 to ONE of ``dim``
    buckets (bucket = the 60-bit md5 hash mod ``dim``, sign = hash bit
    55 — disjoint from the bucket bits for any power-of-two ``dim`` up to
    2^55, so colliding tokens still cancel in expectation), and the
    bucket sums, L2-normalized, are the document's dense vector. The
    classical no-model featurizer — deterministic, engine-portable, and
    the sparse-random-projection JL bound applies — so the
    whole embed → ANN → near-dup pipeline (lsh/ivf/int8/pq_topk,
    embedding_near_dup, semantic_dedup) runs self-contained on raw text
    when no learned embedding column exists. A learned encoder drops in
    by replacing this one map stage.

    Output: (key, n_tokens, norm, embedding array<double>) — the vector
    is L2-normalized (cosine == dot downstream); all-cancelled or empty
    docs keep the zero vector with norm 0 rather than dropping.

    Determinism contract: bucket sums are exact integer sums (order-free);
    the norm folds the fixed-order ``dim``-array of integer-valued doubles
    (exact below 2^53), so every engine computing the same tokens gets
    bit-identical vectors. 100 TB: one explode + two hash aggregations
    keyed by (doc, bucket) then doc — map-side partial aggregation does
    the heavy lifting; no joins, no windows, no driver state."""
    from nutch_spark.datapipe.dedup import h64
    from nutch_spark.datapipe.textstats import tokens

    ex = corpus.select(key, F.explode(tokens(text)).alias("_tok"))
    h = h64(F.col("_tok"))
    per_bucket = (
        ex.select(
            key,
            F.pmod(h, F.lit(dim)).cast("int").alias("_b"),
            (F.shiftright(h, 55).bitwiseAND(F.lit(1)) * 2 - 1).alias("_sgn"),
        )
        .groupBy(key, "_b")
        .agg(F.sum("_sgn").alias("_s"), F.count(F.lit(1)).alias("_c"))
    )
    per_doc = per_bucket.groupBy(key).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_s"))).alias("_m"),
        F.sum("_c").alias("_nt"),
    )
    e_sql = (
        f"transform(sequence(0, {dim - 1}),"
        " d -> cast(coalesce(element_at(_m, d), cast(0 as bigint)) as double))"
    )
    return (
        corpus.select(key)
        .join(per_doc, key, "left")  # zero-token docs keep the zero vector
        .withColumn("_e", F.expr(e_sql))
        .withColumn("_nrm", F.expr("sqrt(aggregate(_e, 0.0D, (a, x) -> a + x * x))"))
        .select(
            key,
            F.coalesce("_nt", F.lit(0)).cast("long").alias("n_tokens"),
            F.col("_nrm").alias("norm"),
            F.expr(
                "CASE WHEN _nrm > 0 THEN transform(_e, x -> x / _nrm)"
                " ELSE _e END"
            ).alias("embedding"),
        )
    )


def _row_embed_apply(text: Column | str, dim: int, fn) -> Column:
    """Shared per-row skeleton for the stream-safe featurizer expressions:
    tokenize, hash each token ONCE (the hash array binds to a lambda
    variable — the same evaluate-once trick as _l2_argmin_sql), build the
    integer bucket-sum array ``e`` with ``dim`` integer folds, and apply
    ``fn(e)``. No explode, no aggregation — a pure map expression, so a
    STREAM can use it ahead of its one stateful operator."""
    from nutch_spark.datapipe.dedup import h64
    from nutch_spark.datapipe.textstats import tokens

    # tokenize the TEXT column (name or Column); h64 is THE shared 60-bit
    # hash (dedup.py) — one definition, so stream/batch bit-identity
    # cannot drift
    hs = F.transform(tokens(text), h64)

    def build(arr: Column) -> Column:
        e = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda a, h: a
                + F.when(
                    F.pmod(h, F.lit(dim)) == d.cast("long"),
                    F.shiftright(h, 55).bitwiseAND(F.lit(1)) * 2 - 1,
                ).otherwise(F.lit(0).cast("long")),
            ).cast("double"),
        )
        return fn(e)

    wrapped = F.transform(F.array(F.struct(hs.alias("h"))), lambda s: build(s["h"]))
    return F.element_at(wrapped, 1)


def row_embed_bucket(text: Column | str, *, dim: int = 64) -> Column:
    """The sign-pattern LSH bucket of :func:`hashed_embedding`'s vector as
    ONE per-row expression; integer bucket sums are order-free, so the
    bucket string is bit-identical to sign-bucketing hashed_embedding's
    vector for the same text (pinned by test). Cost: ``dim`` integer
    passes over the per-row hash array; the md5 is NOT recomputed per
    dim. NOTE the scale caveat measured on real corpora: component signs
    CORRELATE across documents sharing a token distribution (6%+ of a
    synthetic corpus lands in one bucket), so a pairwise join on this
    bucket alone is quadratic in the hot bucket — batch near-dup guards
    with a hot-bucket census + digest sub-bucketing
    (text_embed_neardup_pairs); streams dedup on
    :func:`row_embed_digest` instead."""
    return _row_embed_apply(
        text,
        dim,
        lambda e: F.concat_ws(
            "",
            F.transform(e, lambda x: F.when(x >= 0, "1").otherwise("0")),
        ),
    )


def row_embed_digest(text: Column | str, *, dim: int = 64) -> Column:
    """The QUANTIZED-vector identity digest of :func:`hashed_embedding`'s
    vector as ONE per-row expression: md5 over the floor(1e6·x/‖x‖)
    components — exactly dp_text_embed's ``emb_digest`` column, so batch
    and stream agree bit-for-bit (pinned by test). Two documents share a
    digest iff their hashed vectors are 1e-6-identical — in practice the
    same token MULTISET, i.e. bag-of-words identity: order-invariant
    exact dedup (a reordered copy collapses; a genuinely different doc
    that merely shares a sign pattern does not). The stream-safe dedup
    key, immune to the sign-correlation hot bucket."""

    def digest(e: Column) -> Column:
        nrm = F.sqrt(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x)
        )
        q = F.when(
            nrm > 0,
            F.transform(e, lambda x: F.floor(x / nrm * 1000000.0).cast("long")),
        ).otherwise(F.transform(e, lambda x: F.lit(0).cast("long")))
        return F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))))

    return _row_embed_apply(text, dim, digest)


def text_embed_neardup_pairs(
    corpus: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    *,
    dim: int = 64,
    threshold: float = 0.99,
    round_sim: int = 6,
    max_bucket: int = 64,
) -> DataFrame:
    """Text near-dup pairs in embedding space, self-contained: raw text →
    :func:`hashed_embedding` → sign-pattern LSH bucket → same-bucket
    cosine pairs ≥ ``threshold``. Output (id_a, id_b, cosine_sim).

    The hot-bucket guard (the part that survives 100 TB): component
    signs CORRELATE across documents sharing a token distribution — a
    measured 6%+ of a synthetic corpus lands in ONE sign bucket, so a
    plain bucket self-join is quadratic in the hot bucket (at 1B docs a
    6% bucket is 3.6e15 candidate pairs). Buckets larger than
    ``max_bucket`` are sub-bucketed by the quantized-vector identity
    digest: inside a hot bucket only 1e-6-identical vectors (exact and
    reordered copies — the pairs a dedup pass actually needs, scoring
    1.0) still pair; sign-equal-but-different documents stop generating
    candidates. The census of hot buckets is tiny by construction
    (≤ n/max_bucket rows) and broadcasts. The embedding table is
    localCheckpoint-ed once so the self-join's two sides reuse one
    computation instead of re-running the featurizer per side (the same
    materialize-once discipline as minhash_lsh_pairs)."""
    # norm > 0, not n_tokens > 0: a doc whose tokens all CANCEL (same
    # bucket, opposite signs) keeps the zero vector — its cosine against
    # anything is 0/0 = NaN, which BOTH engines order above 0.99, and
    # every zero vector shares one bucket AND one digest, so the guard
    # could not split them. Zero-norm docs have no direction to compare;
    # they are out of embedding-space dedup by definition.
    emb = hashed_embedding(corpus, text, key, dim=dim).filter(
        F.col("norm") > 0
    )
    q_expr = (
        "transform(embedding, x -> cast(floor(x * 1000000.0D) as bigint))"
    )
    c = (
        emb.withColumn(
            "bucket",
            F.array_join(
                F.transform(
                    "embedding", lambda x: F.when(x >= 0, "1").otherwise("0")
                ),
                "",
            ),
        )
        .withColumn(
            "_qd",
            F.expr(
                f"md5(concat_ws(',', transform({q_expr}, x -> cast(x as string))))"
            ),
        )
        .localCheckpoint(eager=True)
    )
    hot = (
        c.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("bucket", F.lit(True).alias("_hot"))
    )
    keyed = (
        c.join(F.broadcast(hot), "bucket", "left")
        .withColumn(
            "_k",
            F.when(
                F.col("_hot"), F.concat(F.col("bucket"), F.lit(":"), F.col("_qd"))
            ).otherwise(F.col("bucket")),
        )
    )
    a = keyed.select(
        "_k", F.col(key).alias("id_a"), F.col("embedding").alias("va")
    )
    b = keyed.select(
        "_k", F.col(key).alias("id_b"), F.col("embedding").alias("vb")
    )
    return (
        a.join(b, ["_k"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_sim).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
    round_sim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, neighbor_id, cosine_sim).

    Self-matches (same key) are excluded. The join is a broadcast
    nested-loop on purpose: |queries| is small; corpus streams through.
    """
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("_qv")
    )
    c = corpus.select(F.col(key).alias("neighbor_id"), F.col(vec).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.round(cosine(F.col("_qv"), F.col("_cv")), round_sim)
                if round_sim is not None
                else cosine(F.col("_qv"), F.col("_cv"))
            ).alias("cosine_sim"),
        )
    )
    # round_sim: rank on the ROUNDED value + id tie-break so float
    # accumulation order can never flip a cross-engine comparison
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(vec: str, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (string of 0/1) for random-hyperplane LSH
    over column name ``vec``. The whole expression renders as ONE SQL
    string: constructing bits-many HOF Columns through py4j costs ~1 s
    of driver chatter per plan (see _cents_rank), the parser does it in
    a fraction."""
    bits = []
    for plane in planes:
        lit = "array(" + ",".join(_dlit(x) for x in plane) + ")"
        dot = (
            f"aggregate(zip_with(`{vec}`, {lit}, (x, y) ->"
            " cast(x as double) * y), 0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"case when {dot} >= 0.0D then '1' else '0' end")
    return F.expr("concat(" + ",".join(bits) + ")")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    round_sim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket in any of
    ``tables`` independent hash tables. Recall grows with tables; shuffle
    stays O(rows * tables). ``round_sim`` rounds the similarity BEFORE
    ranking (with the id tie-break) so orderings are stable across engines
    with different float-accumulation orders — set it when comparing against
    an external oracle."""
    def bucketed(df: DataFrame, id_alias: str) -> DataFrame:
        out = []
        for t in range(tables):
            planes = _hyperplanes(dim, bits, seed + t)
            out.append(
                df.select(
                    F.col(key).alias(id_alias),
                    F.col(vec).alias(f"_v_{id_alias}"),
                    F.lit(t).alias("table"),
                    lsh_bucket(vec, planes).alias("bucket"),
                )
            )
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    qb = bucketed(queries, "query_id")
    cb = bucketed(corpus, "neighbor_id")
    sim = cosine(F.col("_v_query_id"), F.col("_v_neighbor_id"))
    if round_sim is not None:
        sim = F.round(sim, round_sim)
    pairs = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return pairs.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def vec_norm(v: Column) -> Column:
    """sqrt(sum(x^2)) of an ARRAY<FLOAT/DOUBLE> column (double math) —
    the same accumulation order as :func:`cosine`'s norm subterm, so
    dot/(norm_v * lit_norm) is bit-identical to cosine(v, lit)."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def _dlit(x: float) -> str:
    """A Spark SQL DOUBLE literal that round-trips ``x`` exactly."""
    x = float(x)
    if x != x:  # Spark's string->double cast wants 'NaN', not Python's 'nan'
        return "cast('NaN' as double)"
    if x == float("inf"):  # likewise 'Infinity', not 'inf'
        return "cast('Infinity' as double)"
    if x == float("-inf"):
        return "cast('-Infinity' as double)"
    r = repr(x)
    if "e" in r or "E" in r:  # scientific notation
        return f"cast('{r}' as double)"
    return f"{r}D"


def _cents_rank(vcol: str, norm_col: str, cents, round_sim: int = 6) -> Column:
    """Cell ids ordered nearest-first against literal centroids. One
    struct array, each centroid DOT computed exactly once — a chained
    when/greatest fold would duplicate every cosine subtree per
    comparison and blow the plan up exponentially (the first draft took
    minutes to analyze). The row norm comes in as column ``norm_col``
    (computed ONCE per row) and each centroid norm as a driver-side
    literal — recomputing the row norm inside all K cosines tripled the
    higher-order-function evaluation cost per row. Same IEEE doubles as
    cosine(): identical accumulation order, math.sqrt == JVM sqrt. The
    whole expression is built as ONE SQL string (F.expr): constructing
    K struct/HOF Columns through py4j cost ~1 s of driver chatter per
    plan, the parser does it in ~0.2 s. Cosines are rounded before
    ranking so the cid tie-break matches the SQL oracle's
    round(s, 6) ... ORDER BY s DESC, cid exactly."""
    arr = _cents_struct_array_sql(vcol, norm_col, cents, round_sim)
    return F.expr(f"transform(array_sort({arr}), x -> x.cid)")


def _cents_df(spark, cents) -> DataFrame:
    """The one-row codebook DataFrame :func:`_with_cents` attaches. Callers
    that attach the same codebook to several sides of one query (ivf_topk's
    corpus and queries) build it ONCE and crossJoin the same object so the
    broadcast exchange is reused instead of rebuilt per side."""
    lut = [[float(x) for x in cv] for _cid, cv in cents]
    norms = [
        math.sqrt(sum(float(x) * float(x) for x in cv)) for _cid, cv in cents
    ]
    cids = [int(cid) for cid, _cv in cents]
    return spark.createDataFrame(
        [(lut, norms, cids)],
        schema=(
            "_cb_lut array<array<double>>, _cb_norms array<double>,"
            " _cb_cids array<int>"
        ),
    )


def _with_cents(df: DataFrame, cents) -> DataFrame:
    """Attach the centroid codebook to ``df`` as three one-row BROADCAST
    columns (`_cb_lut` array<array<double>>, `_cb_norms` array<double>,
    `_cb_cids` array<int>) instead of inlining K*dim literals into the
    expression tree (guide §3 broadcast-the-small-side + §5 driver/plan
    cost). The values are the exact doubles the literal form embedded
    (Python float -> JVM double is bit-exact either way; the norms use
    the same math.sqrt fold), so every downstream fold sees identical
    IEEE inputs and certified hashes cannot move. What changes is the
    PLAN: the expression tree that used to grow with K*dim (re-analyzed
    and re-codegen'd for every Lloyd round, ~0.3-1 s of driver time per
    round, and shipped in every task closure) is now constant-size and
    IDENTICAL across rounds — Spark's whole-stage-codegen cache keys on
    the generated source, so round 2+ reuse round 1's compiled class,
    and at 100 TB the task closure carries a broadcast id, not a
    codebook."""
    return df.crossJoin(F.broadcast(_cents_df(df.sparkSession, cents)))


def _cents_struct_array_cols_sql(
    vcol: str, norm_col: str, round_sim: int = 6
) -> str:
    """Column-reference twin of :func:`_cents_struct_array_sql`: the same
    (neg=-round(cosine), cid) struct-array expression, but reading the
    codebook from the `_cb_*` columns :func:`_with_cents` attaches rather
    than from plan literals. Fold order, rounding and tie-break are
    token-for-token identical — only the array SOURCE differs — so the
    selected cells (and every certified hash downstream) are unchanged."""
    dot = (
        f"aggregate(zip_with(`{vcol}`, cw, (x, y) ->"
        " cast(x as double) * y), 0.0D, (acc, x) -> acc + x)"
    )
    return (
        "transform(`_cb_lut`, (cw, i) -> named_struct("
        f"'neg', -round({dot} / (`{norm_col}` * element_at(`_cb_norms`, i + 1)),"
        f" {round_sim}), 'cid', element_at(`_cb_cids`, i + 1)))"
    )


def _cents_rank_cols(vcol: str, norm_col: str, round_sim: int = 6) -> Column:
    """Column-reference twin of :func:`_cents_rank` (see
    :func:`_cents_struct_array_cols_sql`)."""
    arr = _cents_struct_array_cols_sql(vcol, norm_col, round_sim)
    return F.expr(f"transform(array_sort({arr}), x -> x.cid)")


def _cents_struct_array_sql(
    vcol: str, norm_col: str, cents, round_sim: int = 6
) -> str:
    """SQL text for the (neg=-round(cosine), cid) struct array — see
    _cents_rank. One ``transform`` over the centroid array literal (with
    parallel norm/cid literals indexed by the lambda's position argument)
    instead of K unrolled cosine structs: the same compile-time fix as
    _l2_argmin_sql — the fold order, rounding, and tie-break cids are
    identical, so certified hashes are unchanged."""
    lut = "array(" + ",".join(
        "array(" + ",".join(_dlit(x) for x in cv) + ")" for _cid, cv in cents
    ) + ")"
    norms = "array(" + ",".join(
        _dlit(math.sqrt(sum(float(x) * float(x) for x in cv)))
        for _cid, cv in cents
    ) + ")"
    cids = "array(" + ",".join(str(cid) for cid, _cv in cents) + ")"
    dot = (
        f"aggregate(zip_with(`{vcol}`, cw, (x, y) ->"
        " cast(x as double) * y), 0.0D, (acc, x) -> acc + x)"
    )
    return (
        f"transform({lut}, (cw, i) -> named_struct("
        f"'neg', -round({dot} / (`{norm_col}` * element_at({norms}, i + 1)),"
        f" {round_sim}), 'cid', element_at({cids}, i + 1)))"
    )


def _lloyd_refine(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    *,
    vec: str,
    n_iter: int,
    round_sim: int = 6,
) -> list[tuple[int, list[float]]]:
    """``n_iter`` rounds of Lloyd's k-means over (cid, vector) centroids:
    assign every corpus vector to its nearest cell (cosine rounded to
    ``round_sim``, cid tie-break — the same ranking the callers use at
    query time), re-center each cell at the element-wise mean via one
    distributed groupBy-avg, and keep the old centroid for empty cells.
    Only K centroid rows reach the driver per round — the corpus is never
    collected.

    Determinism caveat: the re-center means come from distributed F.avg,
    whose floating-point summation order is partition-dependent, so the
    refined centroids can differ from an oracle's in low-order bits. The
    round(cos, round_sim) tie-break makes an assignment flip vanishingly
    unlikely (a cosine would have to land within ~1e-16 of a 0.5e-6
    rounding boundary) but not impossible — the oracle parity this buys
    is probabilistic, not exact. Callers that need bit-exact parity pass
    the SAME refined centroids to both sides (which the registry queries
    do: oracles receive the literal centroid values)."""
    dim = len(cents[0][1]) if cents else 0
    base = corpus.select(
        F.col(vec).alias("_v"), vec_norm(F.col(vec)).alias("_n")
    )
    if n_iter > 1:
        # cache the (vector, norm) working set across rounds — without it
        # every Lloyd round re-scans the source and recomputes the norms
        # (the same reason MLlib's KMeans caches its norm-augmented RDD);
        # unpersisted below, before the refined centroids go to query-time
        # plans
        base = base.persist()
    for _ in range(n_iter):
        # codebook rides a one-row broadcast (_with_cents), NOT plan
        # literals: every round's plan is the same constant-size tree, so
        # Catalyst analyzes it in O(1) and the whole-stage-codegen cache
        # (keyed on generated source) reuses round 1's compiled class —
        # the per-round ~0.3-1 s replan/recompile this family paid is gone
        assigned = _with_cents(base, cents).select(
            F.element_at(_cents_rank_cols("_v", "_n", round_sim), 1).alias(
                "cell"
            ),
            F.col("_v"),
        )
        # element-wise mean via posexplode: one avg over (cell, pos) keys
        # (map-side partial agg; <= K*dim groups) instead of `dim` separate
        # avg expressions — the small plan analyzes in a fraction of the
        # time and shuffles the same K*dim partials
        means = (
            assigned.select("cell", F.posexplode("_v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("col").cast("double")).alias("m"))
        )
        new = dict(cents)
        acc: dict[int, dict[int, float]] = {}
        for r in means.collect():  # <= n_centroids * dim rows
            acc.setdefault(r["cell"], {})[r["pos"]] = float(r["m"])
        for cell, by_pos in acc.items():
            if len(by_pos) == dim:
                new[cell] = [by_pos[i] for i in range(dim)]
        cents = sorted(new.items())
    if n_iter > 1:
        base.unpersist()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 0,
    round_sim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned into
    Voronoi cells around centroids; each query scores only the ``n_probe``
    nearest cells. The second ANN scale path next to ``lsh_topk``.

    Seed centroids are picked deterministically as the ``n_centroids``
    corpus vectors with the smallest md5(key) — a pseudo-random but
    reproducible spread computable by any engine. ``n_iter`` rounds of
    Lloyd's k-means then refine them (assign each corpus vector to its
    nearest cell by the same rounded-cosine/cid ranking, re-center each
    cell at the element-wise mean, empty cells keep their centroid) —
    fully deterministic, so a SQL oracle can mirror every round. Only K
    centroid rows are ever collected (the corpus never is): the seed via
    TakeOrderedAndProject, then one K-row groupBy-avg collect per
    iteration — the classic distributed k-means shape (same driver-side
    pattern as the BPE train loop). Shuffle: per iteration one partial
    aggregation on cell id; at query time corpus scored once against
    n_centroids (map-only), then one equi-join on cell id —
    O(rows·n_probe/n_centroids) pair work.
    """
    cent_rows = (
        corpus.select(key, vec)
        .orderBy(F.md5(F.col(key).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    cents = [(i, [float(x) for x in r[1]]) for i, r in enumerate(cent_rows)]

    cents = _lloyd_refine(corpus, cents, vec=vec, n_iter=n_iter)

    # query-time assignment reads the codebook from the same one-row
    # broadcast as training (_with_cents): identical doubles, identical
    # fold — but the corpus/query plans now share ONE constant-size
    # generated-code shape with the training rounds instead of each
    # carrying a fresh K*dim-literal tree. ONE codebook DataFrame for
    # both sides so the broadcast exchange is built once and reused.
    cb = _cents_df(corpus.sparkSession, cents)
    c = (
        corpus.select(
            F.col(key).alias("neighbor_id"),
            F.col(vec).alias("_cv"),
            vec_norm(F.col(vec)).alias("_n"),
        )
        .crossJoin(F.broadcast(cb))
    ).select(
        "neighbor_id",
        "_cv",
        F.element_at(_cents_rank_cols("_cv", "_n"), 1).alias("cell"),
    )
    q = (
        queries.select(
            F.col(key).alias("query_id"),
            F.col(vec).alias("_qv"),
            vec_norm(F.col(vec)).alias("_n"),
        )
        .crossJoin(F.broadcast(cb))
    ).select(
        "query_id",
        "_qv",
        F.explode(
            F.slice(_cents_rank_cols("_qv", "_n"), 1, n_probe)
        ).alias("cell"),
    )
    sim = cosine(F.col("_qv"), F.col("_cv"))
    if round_sim is not None:
        sim = F.round(sim, round_sim)
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    threshold: float = 0.9,
    dim: int = 64,
    bits: int = 6,
    tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Corpus pairs (a<b) with cosine >= threshold, via LSH candidates."""
    ids = corpus.select(F.col(key).alias("id"), F.col(vec).alias("v"))
    cands = None
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + t)
        b = ids.withColumn("bucket", lsh_bucket("v", planes))
        a_, b_ = b.alias("a"), b.alias("b")
        c = a_.join(
            b_, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def quantize_int8(vec: Column, *, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of an ARRAY<FLOAT>: clip(floor(x*scale)).

    floor (not round) so Spark and the DuckDB oracle agree bit-for-bit —
    the two engines disagree on .5 rounding, never on floor.
    """
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x.cast("double") * scale))
        ).cast("int"),
    )


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Top-k by INTEGER dot product over int8-quantized vectors.

    The memory-bandwidth scale path: 4× smaller vectors than float32, and
    the ranking score is exact integer arithmetic — deterministic across
    engines, partitions and retries (no float accumulation order). Same
    broadcast nested-loop shape as brute_force_topk: queries broadcast,
    corpus streams, quantization happens once per row BEFORE the join.
    """
    q = queries.select(
        F.col(key).alias("query_id"), quantize_int8(F.col(vec)).alias("_qv")
    )
    c = corpus.select(
        F.col(key).alias("neighbor_id"), quantize_int8(F.col(vec)).alias("_cv")
    )
    dot = F.aggregate(
        F.zip_with("_qv", "_cv", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dot.alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iter: int = 0,
    round_sim: int = 6,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540
    — public paper): cluster the embedding space, then inside each cluster
    drop every example whose cosine similarity to a KEPT example exceeds
    ``threshold``, keeping the example FARTHEST from the cluster centroid
    (the paper's keep-low-centroid-similarity rule: boundary examples are
    the informative ones).

    Output: (key, cell, cent_sim, is_kept) for every corpus row.

    Deviations from the paper, both documented and deterministic: centroids
    seed from the ``n_centroids`` md5-smallest corpus vectors (the
    ivf_topk sampling), optionally refined by ``n_iter`` deterministic
    Lloyd rounds (_lloyd_refine — the oracle mirrors each round), and
    the within-cluster sweep is the
    greedy prefix rule — a row is dropped when ANY row ranked before it
    (farther from the centroid, id tie-break) is ``>= threshold`` similar,
    whether or not that earlier row itself survived. This makes the result
    a pure function of the pair set — no sequential scan to parallelize
    away — at the cost of occasionally dropping a row whose only similar
    predecessor was itself dropped (transitively-similar rows, which the
    paper's cluster-level dedup also removes).

    Scale shape: one map-only assignment pass against broadcast centroids,
    then one vectorized pair sweep per cell — O(sum cell²) work and O(max
    cell² ) task memory. Cells must stay bounded: scale ``n_centroids``
    with the corpus (the paper uses 50k clusters for LAION-440M; target
    cell size, not cluster count, is the invariant). Cosines are rounded to
    ``round_sim`` BEFORE thresholding so the keep/drop decision is
    reproducible across engines; the vectorized sweep makes the identical
    decision via the single-compare form (_ge_round_cut).
    """
    cent_rows = (
        corpus.select(key, vec)
        .orderBy(F.md5(F.col(key).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    cents = [(i, [float(x) for x in r[1]]) for i, r in enumerate(cent_rows)]
    cents = _lloyd_refine(corpus, cents, vec=vec, n_iter=n_iter, round_sim=round_sim)

    # centroid cosines are ROUNDED before the argmax so assignment (and
    # its cid tie-break) is bit-identical to the SQL oracle's
    # round(s, 6) ... ORDER BY s DESC, cid — an unrounded sort could
    # pick a different cell than the oracle within 1e-6 of a tie; the
    # row norm is computed once per row (see _cents_rank)
    assigned = _with_cents(
        corpus.select(
            F.col(key).alias("id"),
            F.col(vec).alias("v"),
            vec_norm(F.col(vec)).alias("_n"),
        ),
        cents,
    ).select(
        "id",
        "v",
        "_n",
        F.element_at(
            F.expr(
                "array_sort("
                + _cents_struct_array_cols_sql("v", "_n", round_sim)
                + ")"
            ),
            1,
        ).alias("_b"),
    ).select(
        "id",
        "v",
        "_n",  # carried to the pair stage: na/nb reused, not re-folded
        F.col("_b.cid").alias("cell"),
        F.round(-F.col("_b.neg"), round_sim).alias("cent_sim"),
    )
    w = Window.partitionBy("cell").orderBy(F.asc("cent_sim"), F.asc("id"))
    # materialize ONCE: ranked is consumed twice (the per-cell pair sweep +
    # the final keep/drop join), and its input is the centroid argmax
    # expression plus a window — without the checkpoint both consumers
    # re-run both (no exchange reuse fires across the differing prunings)
    ranked = assigned.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    # within-cell pair sweep, vectorized per cell (guide §4.2): the former
    # self-join evaluated an INTERPRETED zip_with/aggregate dot per candidate
    # pair (HOFs are CodegenFallback — ~sum cell² × dim lambda steps); one
    # pandas task per cell now left-folds the same doubles in the same order
    # over whole matrices (see _cell_pair_dropper's parity argument), with
    # the norms still computed ONCE per row in the assignment stage
    # (vec_norm's fold order == cosine()'s norm subterm). Each dropped id
    # appears at most once (cells partition rows), so no distinct is needed.
    from pyspark.sql.types import StructField, StructType

    dropped = (
        ranked.select("id", "v", "_n", "rn", "cell")
        .groupBy("cell")
        .applyInPandas(
            _cell_pair_dropper(threshold, round_sim),
            StructType([StructField("id", ranked.schema["id"].dataType)]),
        )
    )
    return (
        ranked.join(dropped.withColumn("_dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(key),
            "cell",
            "cent_sim",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_kept"),
        )
    )


def _l2_argmin_sql(sub_sql: str, cents, round_d: int = 6) -> str:
    """SQL text for the 0-based id of the codeword nearest (squared L2)
    to the ``sub_sql`` subvector — the PQ/encode twin of
    :func:`_cents_rank`'s determinism contract, cheaper by construction:
    distances round to ``round_d`` and land in one flat double array, and
    ``array_position(a, array_min(a))`` picks the FIRST minimum — the
    lowest-cid tie-break a SQL oracle's row_number() ORDER BY round(d,6)
    ASC, cid produces — with no per-codeword struct and no sort (the
    first PQ draft array_sorted ks structs per subspace per row; at
    m=16/ks=32 that was 512 struct builds + 16 sorts per row and
    dominated the encode stage)."""
    lut = "array(" + ",".join(
        "array(" + ",".join(_dlit(x) for x in cv) + ")" for _cid, cv in cents
    ) + ")"
    return _l2_argmin_from_lut_sql(sub_sql, lut, round_d)


def _l2_argmin_from_lut_sql(sub_sql: str, lut_sql: str, round_d: int = 6) -> str:
    """Core of :func:`_l2_argmin_sql` with the codebook LUT supplied as
    arbitrary SQL text — a literal array (original form) or a `_pq_cb`
    broadcast-column slice (:func:`_with_pq_cb`); the fold is identical
    either way, so the chosen codes never depend on which form fed it."""
    # ONE transform over the codebook, not ks unrolled distance
    # expressions: the unrolled form built a 512-node tree at m=16/ks=32
    # whose Catalyst analysis + codegen dominated the whole PQ query on
    # small inputs (~2/3 of dp_pq_topk's wall time was plan compilation);
    # the data-driven loop is the identical fold in the identical order —
    # same doubles, same round, array_position still picks the FIRST
    # minimum (lowest-cid tie-break) — so certified hashes are unchanged.
    arr = (
        f"transform({lut_sql}, cw -> round(aggregate(zip_with({sub_sql}, cw,"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        f" 0.0D, (acc, x) -> acc + x), {round_d}))"
    )
    # bind the distance array to a lambda variable so it's EVALUATED ONCE —
    # writing array_position(arr, array_min(arr)) inline duplicates the
    # whole ks-distance expression (Catalyst does not CSE it; the doubled
    # form measured ~40% slower and shipped 5 MiB task binaries)
    return (
        "(element_at(transform(array(" + arr + "),"
        " a -> array_position(a, array_min(a))), 1) - 1)"
    )


def _with_pq_cb(df: DataFrame, cb) -> DataFrame:
    """Attach the full per-subspace PQ codebook (m × ks × dim/m doubles)
    as ONE one-row broadcast column `_pq_cb` — the PQ twin of
    :func:`_with_cents`, with the same bit-parity argument: the doubles
    are exactly the ones the literal form embedded; only the plan shape
    changes (constant-size expression tree, codegen-cache hits across
    Lloyd rounds, broadcast id instead of a codebook in every task
    closure)."""
    spark = df.sparkSession
    lut = [[[float(x) for x in cw] for _cid, cw in cb_j] for cb_j in cb]
    one = spark.createDataFrame(
        [(lut,)], schema="_pq_cb array<array<array<double>>>"
    )
    return df.crossJoin(F.broadcast(one))


def _pq_train(
    corpus: DataFrame,
    *,
    vec: str,
    key: str,
    dim: int,
    m: int,
    ks: int,
    n_iter: int,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks: the ``ks`` corpus vectors with the
    smallest md5(key) seed EVERY subspace's codewords (their j-th
    subvectors), then ``n_iter`` rounds of per-subspace Lloyd's k-means
    refine them — ALL subspaces in one distributed job per round (each
    row emits its m (subspace, nearest-codeword, subvector) assignments
    via one explode, then a single groupBy(j, cell) mean), so driver
    traffic is bounded at m*ks rows per round and the corpus is never
    collected. Same determinism contract as _lloyd_refine: assignment by
    round(L2^2, 6) ASC with cid tie-break, empty cells keep their
    codeword; the re-center means come from distributed avg (see
    _lloyd_refine's determinism caveat — round-6 protected,
    probabilistic not exact)."""
    sd = dim // m
    cent_rows = (
        corpus.select(key, vec)
        .orderBy(F.md5(F.col(key).cast("string")))
        .limit(ks)
        .collect()
    )
    cb = [
        [
            (i, [float(x) for x in r[1]][j * sd : (j + 1) * sd])
            for i, r in enumerate(cent_rows)
        ]
        for j in range(m)
    ]
    if n_iter <= 0:
        return cb
    base = corpus.select(F.col(vec).alias("_v"))
    if n_iter > 1:
        base = base.persist()
    for _ in range(n_iter):
        # codebook via one-row broadcast (_with_pq_cb), not literals: the
        # per-round assignment plan is constant-size and identical across
        # rounds — see _with_cents for the full replan/codegen argument
        entries = []
        for j in range(m):
            sub = f"slice(`_v`, {j * sd + 1}, {sd})"
            cell = _l2_argmin_from_lut_sql(
                sub, f"element_at(`_pq_cb`, {j + 1})"
            )
            entries.append(
                f"named_struct('j', {j}, 'cell', cast({cell} as int),"
                f" 'sv', transform({sub}, x -> cast(x as double)))"
            )
        stacked = _with_pq_cb(base, cb).select(
            F.explode(F.expr("array(" + ",".join(entries) + ")")).alias("s")
        ).select("s.j", "s.cell", "s.sv")
        means = stacked.groupBy("j", "cell").agg(
            *[F.avg(F.expr(f"sv[{i}]")).alias(f"m{i}") for i in range(sd)]
        ).collect()
        got = {
            (r["j"], r["cell"]): [float(r[f"m{i}"]) for i in range(sd)]
            for r in means
        }
        cb = [
            [(cid, got.get((j, cid), cw)) for cid, cw in cb[j]]
            for j in range(m)
        ]
    if n_iter > 1:
        base.unpersist()
    return cb


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    round_sim: int = 6,
) -> DataFrame:
    """Product-Quantization approximate top-k — the memory-compression ANN
    scale path next to lsh_topk (hashing), ivf_topk (partitioning), and
    int8_topk (scalar quantization). Vectors split into ``m`` subspaces
    of dim/m; each subspace trains ``ks`` codewords (Jégou et al. 2011,
    "Product quantization for nearest neighbor search"); a corpus vector
    encodes as m codeword ids — m bytes instead of dim floats, a
    (4*dim/m)x compression of the index. Query scoring is asymmetric
    distance computation expressed as cosine(query, reconstruction):
    each row's reconstruction is flatten(codeword_j for j in order), so
    the score is ONE flat left-fold dot over dim doubles — bit-identical
    in any engine that folds left-to-right, the same determinism
    contract as cosine()/brute_force_topk. Encoding happens once per row
    BEFORE the broadcast join (map-only); queries broadcast and the
    corpus streams — the same INTENDED BroadcastNestedLoopJoin shape as
    int8_topk, with per-pair work on the reconstruction, not the raw
    vector. At 100 TB the codes column (m bytes/row) is what an index
    shard persists; the reconstruction is recomputed per scan from the
    m*ks*(dim/m)-double codebook literal."""
    sd = dim // m
    cb = _pq_train(
        corpus, vec=vec, key=key, dim=dim, m=m, ks=ks, n_iter=n_iter
    )
    # encode + reconstruct against the broadcast codebook column (same
    # doubles as the literal form — see _with_pq_cb); the encode fold and
    # the first-minimum tie-break are unchanged
    recon_parts = []
    for j in range(m):
        sub = f"slice(`{vec}`, {j * sd + 1}, {sd})"
        lut = f"element_at(`_pq_cb`, {j + 1})"
        code = _l2_argmin_from_lut_sql(sub, lut)
        recon_parts.append(f"element_at({lut}, cast({code} as int) + 1)")
    recon = f"flatten(array({','.join(recon_parts)}))"
    c = _with_pq_cb(corpus, cb).select(
        F.col(key).alias("neighbor_id"), F.expr(recon).alias("_rv")
    )
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("_qv")
    )
    sim = F.round(cosine(F.col("_qv"), F.col("_rv")), round_sim)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("pq_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("pq_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
