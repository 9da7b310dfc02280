"""Scalar expression library (SURVEY.md §2.7).

Every function here returns a pyspark Column built from built-in functions —
JVM-side, codegen-friendly — unless explicitly documented as a pandas UDF.
"""

from nutch_spark.functions.urls import (  # noqa: F401
    url_host,
    url_domain,
    url_tld,
    url_page,
    url_protocol,
    normalize_url,
    url_filter_predicate,
)
from nutch_spark.functions.signatures import (  # noqa: F401
    md5_signature,
    text_profile_signature,
)
from nutch_spark.functions.jexl import jexl_to_sql  # noqa: F401
