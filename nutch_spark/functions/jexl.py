"""JEXL → Spark SQL translation.

The reference exposes arbitrary boolean JEXL expressions as its only "WHERE
clause": Generator ``-expr`` (crawl/Generator.java / CrawlDatum.java:573-625),
``readdb -expr`` (crawl/CrawlDbReader.java:892-954) and ``readhostdb -expr``
(hostdb/ReadHostDb.java:90-137), via util/JexlUtil.java.

JEXL and Spark SQL share almost the whole operator set; translation is
token-level:

  ==  ->  =          &&  -> AND        =~ -> RLIKE (regex) / IN (collection)
  !=  ->  !=         ||  -> OR         !~ -> NOT RLIKE
  !   ->  NOT        eq/ne/lt/gt/le/ge -> comparison operators
  null -> NULL       true/false kept

Variables are remapped through ``columns`` (JEXL camelCase names →
engine snake_case columns, e.g. fetchTime -> fetch_time).  The reference
additionally converts ISO datetimes in the expression to epoch millis
(util/JexlUtil.java:44-60); we translate them to TIMESTAMP literals.
"""

from __future__ import annotations

import re

# default variable map: JEXL names used by the reference's docs/tests
_DEFAULT_COLUMNS = {
    "fetchTime": "fetch_time",
    "modifiedTime": "modified_time",
    "fetchInterval": "fetch_interval",
    "numRecords": "num_records",
    "lastCheck": "last_check",
    "dnsFailures": "dns_failures",
    "connectionFailures": "connection_failures",
    "notModified": "not_modified",
    "redirTemp": "redir_temp",
    "redirPerm": "redir_perm",
}

_ISO_DT = re.compile(r"\b(\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?)?)\b")
_WORD_OPS = [
    (re.compile(r"\beq\b"), "="),
    (re.compile(r"\bne\b"), "!="),
    (re.compile(r"\blt\b"), "<"),
    (re.compile(r"\ble\b"), "<="),
    (re.compile(r"\bgt\b"), ">"),
    (re.compile(r"\bge\b"), ">="),
    (re.compile(r"\band\b", re.I), "AND"),
    (re.compile(r"\bor\b", re.I), "OR"),
    (re.compile(r"\bnot\b", re.I), "NOT"),
    (re.compile(r"\bnull\b", re.I), "NULL"),
]


def jexl_to_sql(expr: str, columns: dict[str, str] | None = None) -> str:
    """Translate a JEXL boolean expression into a Spark-SQL boolean expression.

    The result is also valid ANSI SQL (DuckDB-compatible) except for RLIKE,
    which DuckDB accepts via ``regexp_matches`` — callers that need oracle
    parity should avoid =~ / !~ or translate separately.
    """
    out = expr

    # protect string literals from token rewriting
    literals: list[str] = []

    def _stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = re.sub(r"'[^']*'|\"[^\"]*\"", _stash, out)

    # ISO datetime (the reference converts to epoch ms, JexlUtil.java:44-60)
    out = _ISO_DT.sub(lambda m: f"TIMESTAMP \x01{m.group(1)}\x01", out)

    # operators
    out = out.replace("&&", " AND ").replace("||", " OR ")
    out = re.sub(r"!~", " NOT RLIKE ", out)
    out = re.sub(r"=~", " RLIKE ", out)
    out = re.sub(r"(?<![=!<>])==(?!=)", "=", out)
    out = re.sub(r"!(?![=~])", " NOT ", out)
    for rx, rep in _WORD_OPS:
        out = rx.sub(rep, out)

    # variable renames
    colmap = dict(_DEFAULT_COLUMNS)
    if columns:
        colmap.update(columns)
    for jexl_name, col in sorted(colmap.items(), key=lambda kv: -len(kv[0])):
        out = re.sub(rf"\b{re.escape(jexl_name)}\b", col, out)

    # restore literals, normalize double quotes to single
    def _unstash(m: re.Match) -> str:
        lit = literals[int(m.group(1))]
        if lit.startswith('"'):
            inner = lit[1:-1].replace("'", "''")
            return f"'{inner}'"
        return lit

    out = re.sub(r"\x00(\d+)\x00", _unstash, out)
    out = out.replace("\x01", "'")
    return re.sub(r"\s+", " ", out).strip()
