"""Multi-format date parsing.

The reference parses HTTP dates with a cascade of formats
(/root/reference/src/java/org/apache/nutch/util/HttpDateFormat.java and
src/plugin/index-more/.../MoreIndexingFilter.java:93-162 which tries ~10
patterns before giving up).  ``parse_http_date`` mirrors the cascade with a
single COALESCE of try_to_timestamp calls — JVM-side, null on failure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Formats tried by MoreIndexingFilter.java:120-141 (Java SimpleDateFormat →
# Spark datetime pattern equivalents).  Spark >= 3 refuses day-of-week ('EEE')
# in *parsing* patterns, so the weekday prefix is stripped from the input
# instead (it carries no information).
_FORMATS = (
    "MMM dd HH:mm:ss yyyy",
    "MMM dd HH:mm:ss yyyy zzz",
    "dd MMM yyyy HH:mm:ss zzz",
    "dd MMM yyyy HH:mm:ss",
    # single-digit day variant ("Sun, 6 Nov 1994 ..." — HttpDateFormat's
    # lenient parse accepts it, TestHttpDateFormat.java:50-52)
    "d MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss.SSS zzz",
    "yyyy/MM/dd HH:mm:ss.SSS",
    "yyyy/MM/dd HH:mm:ss zzz",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
    "yyyy.MM.dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "MMM dd yyyy HH:mm:ss zzz",
    "dd.MM.yyyy HH:mm:ss zzz",
    "dd MM yyyy HH:mm:ss zzz",
    "dd.MM.yyyy",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
)


def parse_http_date(col: Column | str) -> Column:
    """Best-effort timestamp from an HTTP header date string (NULL if none fit)."""
    c = F.col(col) if isinstance(col, str) else col
    # drop "Sun, " / "Sun " weekday prefixes (parser rejects EEE patterns).
    # Only actual weekday names — a bare [A-Za-z]{3} would also strip month
    # prefixes ("Dec 31 ...") and break the MMM-first formats below.
    c = F.regexp_replace(
        c, r"^(?i)(Mon|Tues?|Wed(nes)?|Thur?s?|Fri|Satur?|Sun)(day)?,?\s+", ""
    )
    # normalize "GMT"-style zone names the new parser rejects in some spots
    attempts = [F.try_to_timestamp(c)]
    attempts += [F.try_to_timestamp(c, F.lit(fmt)) for fmt in _FORMATS]
    # RFC 850 two-digit years ("06-Nov-94"): Spark's yy maps to 20yy, but
    # SimpleDateFormat pivots on now-80/+20 — a parse landing more than 20
    # years in the future is a last-century date (2094 -> 1994). Applied
    # ONLY to the yy format so genuine far-future Expires headers survive.
    rfc850 = F.try_to_timestamp(c, F.lit("dd-MMM-yy HH:mm:ss zzz"))
    rfc850 = F.when(
        F.year(rfc850) > F.year(F.current_date()) + 20,
        rfc850 - F.expr("INTERVAL 100 YEARS"),
    ).otherwise(rfc850)
    attempts.append(rfc850)
    return F.coalesce(*attempts)
