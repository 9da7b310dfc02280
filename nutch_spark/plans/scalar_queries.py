"""Scalar-function correctness queries (SURVEY.md §2.7): URL normalization
and the TextProfileSignature — the two §4 "hard parts" of the scalar surface.

The normalization oracle is GROUND TRUTH, not a re-implementation: the messy
input URL is constructed from clean parts, normalize_url() runs on the messy
form, and the oracle simply reconstructs the clean form — any drift in any
normalization rule breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nutch_spark.functions.signatures import text_profile_signatures
from nutch_spark.functions.urls import (
    idn_normalize,
    normalize_url,
    normalize_url_scoped,
    url_domain,
    url_host,
    url_tld,
)
from nutch_spark.plans.driver_queries import REGISTRY, fan, q, t

# ---------------------------------------------------------------------------
# F1 — URL normalization chain (BasicURLNormalizer + querystring rules)
# ---------------------------------------------------------------------------


@q(
    "f1_url_normalize",
    """
    SELECT doc_id,
           'http://host' || CAST(doc_id % 20 AS VARCHAR)
             || '.example.com/a/c/page?id=' || CAST(doc_id AS VARCHAR) || '&x=1'
             AS norm_http,
           'https://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.org/x/y/page'
             AS norm_https
    FROM documents
    """,
)
def f1_url_normalize(spark, sf_dir):
    """URL normalization F1 (BasicURLNormalizer.java:44-63,169-230 +
    urlnormalizer-querystring): scheme/host lowercasing, default-port strip,
    fragment removal, /./ and /../ resolution, duplicate-slash collapse,
    session-id parameter removal, trailing-dot host strip — asserted against
    reconstructed ground truth."""
    d = fan(t(spark, sf_dir, "documents").select("doc_id"))
    sid = (F.col("doc_id") % 20).cast("string")
    did = F.col("doc_id").cast("string")
    messy_http = F.concat(
        F.lit("HTTP://Host"), sid, F.lit(".Example.COM:80/a/./b/../c/page?id="),
        did, F.lit("&PHPSESSID=deadbeef&x=1#frag"),
    )
    messy_https = F.concat(
        F.lit("HTTPS://www.Site"), sid, F.lit(".ORG.:443//x//y/page")
    )
    return d.select(
        "doc_id",
        normalize_url(messy_http).alias("norm_http"),
        normalize_url(messy_https).alias("norm_https"),
    )


@q(
    "f1_scoped_normalize",
    """
    WITH k AS (SELECT doc_id AS i FROM documents)
    SELECT i AS doc_id,
      'http://a' || CAST(i % 5 AS VARCHAR)
        || '.example.com/page?_escaped_fragment_=%2Fstate%2F' || CAST(i AS VARCHAR)
        AS crawl_ajax,
      'http://b.example.com/p?x=1#!/s/' || CAST(i AS VARCHAR) AS index_ajax,
      CASE i % 3
        WHEN 0 THEN 'https://secure.example.com/a/' || CAST(i AS VARCHAR)
        WHEN 1 THEN 'https://sub.alwayshttps.org/a/' || CAST(i AS VARCHAR)
        ELSE 'http://plain.example.com/a/' || CAST(i AS VARCHAR) END AS proto,
      'http://old-site.com/p' || CAST(i AS VARCHAR) AS host_mapped,
      CASE WHEN i % 4 = 0
        THEN 'http://xn--mnchen-3ya.de/p' || CAST(i AS VARCHAR)
        ELSE 'http://plain.de/p' || CAST(i AS VARCHAR) END AS idn
    FROM k
    """,
)
def f1_scoped_normalize(spark, sf_dir):
    """Scoped normalizer chains (net/URLNormalizers.java + the ajax, host,
    protocol plugins): crawler scope rewrites ``#!`` to an escaped fragment
    (AjaxURLNormalizer.java:81-109), indexer scope reverses it (:111-170),
    protocol rules force https per host/domain (ProtocolURLNormalizer.java),
    host rules rewrite hostnames (HostURLNormalizer.java), IDN hosts go to
    punycode. Ground-truth oracle: messy inputs reconstructed clean."""
    d = fan(t(spark, sf_dir, "documents").select("doc_id"))
    k = F.col("doc_id")
    s = k.cast("string")
    crawl_in = F.concat(
        F.lit("HTTP://A"), (k % 5).cast("string"),
        F.lit(".Example.COM/page#!/state/"), s,
    )
    index_in = F.concat(
        F.lit("http://b.example.com/p?x=1&_escaped_fragment_=%2Fs%2F"), s
    )
    proto_in = (
        F.when(k % 3 == 0, F.concat(F.lit("http://secure.example.com/a/"), s))
        .when(k % 3 == 1, F.concat(F.lit("http://sub.alwayshttps.org/a/"), s))
        .otherwise(F.concat(F.lit("http://plain.example.com/a/"), s))
    )
    host_in = F.concat(F.lit("http://www.old-site.com/p"), s)
    idn_in = F.when(
        k % 4 == 0, F.concat(F.lit("http://münchen.de/p"), s)
    ).otherwise(F.concat(F.lit("http://plain.de/p"), s))
    return d.select(
        k.alias("doc_id"),
        normalize_url_scoped(crawl_in).alias("crawl_ajax"),
        normalize_url_scoped(index_in, scope="indexer").alias("index_ajax"),
        normalize_url_scoped(
            proto_in,
            host_protocols={"secure.example.com": "https"},
            domain_protocols={"alwayshttps.org": "https"},
        ).alias("proto"),
        normalize_url_scoped(
            host_in, host_map={"www.old-site.com": "old-site.com"}
        ).alias("host_mapped"),
        idn_normalize(idn_in).alias("idn"),
    )


@q(
    "f1_url_parts",
    """
    WITH u AS (
      SELECT doc_id,
             'https://sub.dept.host' || CAST(doc_id % 30 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END
               || ':8443/p/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           'sub.dept.host' || CAST(doc_id % 30 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END AS host,
           'host' || CAST(doc_id % 30 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END AS domain,
           CASE WHEN doc_id % 3 = 0 THEN 'uk' ELSE 'com' END AS tld
    FROM u
    """,
)
def f1_url_parts(spark, sf_dir):
    """URL part extraction (util/URLUtil.java getHost/getDomainName/
    getDomainSuffix): host (port stripped), registrable domain with the
    multi-label public-suffix table (co.uk), TLD — against reconstructed
    ground truth."""
    d = fan(t(spark, sf_dir, "documents").select("doc_id"))
    url = F.concat(
        F.lit("https://sub.dept.host"),
        (F.col("doc_id") % 30).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, ".co.uk").otherwise(".com"),
        F.lit(":8443/p/"),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        url_host(url).alias("host"),
        url_domain(url).alias("domain"),
        url_tld(url).alias("tld"),
    )


# ---------------------------------------------------------------------------
# D7 — TextProfileSignature (bit-exact dedup signature, §4 hard-part 1)
# ---------------------------------------------------------------------------

_TPS_TOKS = r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{Nd}]+'), x -> length(x) > 2)"


@q(
    "d7_text_profile_sig",
    f"""
    WITH d AS (SELECT doc_id, {_TPS_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS v FROM d),
    counts AS (SELECT doc_id, v, count(*) AS cnt FROM tok GROUP BY doc_id, v),
    mf AS (SELECT doc_id, max(cnt) AS max_freq FROM counts GROUP BY doc_id),
    qd AS (SELECT doc_id,
                  CASE WHEN CAST(floor(max_freq * 0.01 + 0.5) AS INT) >= 2
                       THEN CAST(floor(max_freq * 0.01 + 0.5) AS INT)
                       WHEN max_freq > 1 THEN 2 ELSE 1 END AS quant
           FROM mf),
    quantized AS (
      SELECT c.doc_id, c.v,
             CAST(floor(c.cnt / q.quant) * q.quant AS INT) AS cnt, q.quant
      FROM counts c JOIN qd q ON c.doc_id = q.doc_id
    ),
    profile AS (
      SELECT doc_id,
             string_agg(v || ' ' || CAST(cnt AS VARCHAR), chr(10)
                        ORDER BY cnt DESC, v ASC) AS p
      FROM quantized WHERE cnt >= quant GROUP BY doc_id
    )
    SELECT d.doc_id, md5(COALESCE(p.p, '')) AS tps
    FROM d LEFT JOIN profile p ON d.doc_id = p.doc_id
    """,
)
def d7_text_profile_sig(spark, sf_dir):
    """TextProfileSignature D7 (crawl/TextProfileSignature.java:86-175):
    tokenize (letter/digit runs, len>2, lowercase), quantize counts to
    QUANT=round(maxFreq*0.01) floor 2, drop below-quant tokens, sort by
    (freq desc, token), md5 the "token cnt\\n..." profile. Bit-exact across
    engines — this is the dedup signature whose equality drives W4/D1.
    Uses the aggregation-shaped form (explode → groupBy), the scale path."""
    d = fan(t(spark, sf_dir, "documents").select("doc_id", "text"))
    return text_profile_signatures(d).withColumnRenamed("id", "doc_id")


assert "d7_text_profile_sig" in REGISTRY
