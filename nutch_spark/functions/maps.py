"""Map-column helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_put(meta: Column | str, key: str, value: Column) -> Column:
    """Upsert ``key`` into a possibly-null map<string,string> column.

    Duplicate-key safe under the default spark.sql.mapKeyDedupPolicy=
    EXCEPTION: the existing entry is filtered out BEFORE the concat, so
    re-stamping a key never raises DUPLICATED_MAP_KEY.
    """
    m = F.col(meta) if isinstance(meta, str) else meta
    base = F.map_filter(
        F.coalesce(m, F.create_map().cast("map<string,string>")),
        lambda k, _: k != key,
    )
    return F.map_concat(base, F.create_map(F.lit(key), value.cast("string")))
