"""Content signatures for deduplication.

- ``md5_signature``: MD5 of content bytes, URL fallback when content empty
  (/root/reference/src/java/org/apache/nutch/crawl/MD5Signature.java:39-47).
- ``text_profile_signature``: bit-exact re-expression of
  /root/reference/src/java/org/apache/nutch/crawl/TextProfileSignature.java:86-175
  as pure Spark higher-order-function expressions (no Python UDF, stays in
  codegen):
    1. tokens = maximal runs of letter-or-digit chars, lowercased
    2. keep tokens with length > min_token_len (default 2)
    3. maxFreq = max token frequency; QUANT = round(maxFreq*quant_rate),
       raised to 2 when maxFreq>1 else 1 (TextProfileSignature.java:133-139)
    4. counts rounded down to multiples of QUANT; below-QUANT tokens dropped
    5. profile = "token cnt" lines sorted by (freq desc, token asc),
       joined with "\\n"; signature = md5(profile)
    6. empty/absent text falls back to md5 of content/url (``fallback``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_signature(content: Column | str, url: Column | str | None = None) -> Column:
    """MD5 hex of content; falls back to the URL for empty content."""
    c = F.col(content) if isinstance(content, str) else content
    basis = c.cast("string")
    if url is not None:
        u = F.col(url) if isinstance(url, str) else url
        basis = F.coalesce(F.nullif(basis, F.lit("")), u)
    return F.md5(basis)


def text_profile_signature(
    text: Column | str,
    fallback: Column | str | None = None,
    *,
    min_token_len: int = 2,
    quant_rate: float = 0.01,
) -> Column:
    """Quantized token-frequency profile signature (md5 hex string)."""
    t = F.col(text) if isinstance(text, str) else text
    # 1-2. unicode letter/digit runs, lowercase, length > min_token_len
    tokens = F.filter(
        F.split(F.lower(t), r"[^\p{L}\p{Nd}]+"),
        lambda tok: F.length(tok) > min_token_len,
    )
    distinct = F.array_distinct(tokens)
    counted = F.transform(
        distinct,
        lambda val: F.struct(
            F.size(F.filter(tokens, lambda x: x == val)).alias("cnt"),
            val.alias("val"),
        ),
    )
    max_freq = F.coalesce(F.array_max(F.transform(counted, lambda s: s["cnt"])), F.lit(0))
    # QUANT = Math.round(maxFreq * quant_rate) with the <2 adjustment
    quant_raw = F.floor(max_freq * F.lit(float(quant_rate)) + F.lit(0.5)).cast("int")
    quant = F.when(quant_raw >= 2, quant_raw).otherwise(
        F.when(max_freq > 1, F.lit(2)).otherwise(F.lit(1))
    )
    quantized = F.filter(
        F.transform(
            counted,
            lambda s: F.struct(
                (F.floor(s["cnt"] / quant) * quant).cast("int").alias("cnt"),
                s["val"].alias("val"),
            ),
        ),
        lambda s: s["cnt"] >= quant,
    )
    # sort by freq desc then token asc: array_sort comparator
    ordered = F.array_sort(
        quantized,
        lambda a, b: F.when(a["cnt"] != b["cnt"], b["cnt"] - a["cnt"]).otherwise(
            F.when(a["val"] < b["val"], F.lit(-1))
            .when(a["val"] > b["val"], F.lit(1))
            .otherwise(F.lit(0))
        ),
    )
    profile = F.concat_ws(
        "\n", F.transform(ordered, lambda s: F.concat_ws(" ", s["val"], s["cnt"].cast("string")))
    )
    sig = F.md5(profile)
    if fallback is not None:
        fb = F.col(fallback) if isinstance(fallback, str) else fallback
        return F.when(t.isNull() | (F.length(t) == 0), F.md5(fb.cast("string"))).otherwise(sig)
    return sig


def text_profile_signatures(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    *,
    min_token_len: int = 2,
    quant_rate: float = 0.01,
) -> DataFrame:
    """(key, tps) — TextProfileSignature as a distributed aggregation.

    Same bit-exact semantics as ``text_profile_signature`` (the column form),
    but shaped for scale: explode tokens → one partial-aggregating
    groupBy(key, token) → one groupBy(key) collecting the (cnt, token)
    profile (bounded by the doc's distinct-token count). The column form's
    nested filter-inside-transform is O(tokens × distinct) per row in a
    single giant expression and is ~100x slower on long documents.
    """
    t = F.col(text)
    toks = F.filter(
        F.split(F.lower(t), r"[^\p{L}\p{Nd}]+"),
        lambda tok: F.length(tok) > min_token_len,
    )
    ex = df.select(F.col(key).alias("id"), F.explode(toks).alias("v"))
    counts = ex.groupBy("id", "v").agg(F.count(F.lit(1)).alias("cnt"))
    profiles = counts.groupBy("id").agg(
        F.max("cnt").alias("mf"),
        F.collect_list(F.struct(F.col("cnt"), F.col("v"))).alias("items"),
    )
    quant_raw = F.floor(F.col("mf") * F.lit(float(quant_rate)) + F.lit(0.5)).cast("int")
    quant = F.when(quant_raw >= 2, quant_raw).otherwise(
        F.when(F.col("mf") > 1, F.lit(2)).otherwise(F.lit(1))
    )
    quantized = F.filter(
        F.transform(
            "items",
            lambda s: F.struct(
                (F.floor(s["cnt"] / quant) * quant).cast("int").alias("cnt"),
                s["v"].alias("val"),
            ),
        ),
        lambda s: s["cnt"] >= quant,
    )
    # struct array_sort orders by fields ascending; negate cnt → (freq desc, token asc)
    ordered = F.array_sort(
        F.transform(quantized, lambda s: F.struct((-s["cnt"]).alias("nc"), s["val"].alias("val")))
    )
    profile = F.concat_ws(
        "\n",
        F.transform(ordered, lambda s: F.concat_ws(" ", s["val"], (-s["nc"]).cast("string"))),
    )
    sigs = profiles.select("id", F.md5(profile).alias("tps"))
    # docs whose tokens all fall below min_token_len still get md5("")
    all_keys = df.select(F.col(key).alias("id"))
    return all_keys.join(sigs, "id", "left").select(
        "id", F.coalesce("tps", F.md5(F.lit(""))).alias("tps")
    )
