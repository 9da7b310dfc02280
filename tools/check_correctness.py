"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count, sorted
schema, and an order-insensitive value hash (columns sorted by name, rows
sorted by stringified value, floats rounded).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys

import duckdb

STRICT_FLOATS = bool(os.environ.get("STRICT_FLOATS"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT_FLOATS:
            return repr(v)
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from nutch_spark.session import get_spark

    spark = get_spark("correctness_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    results = {}  # name -> {status, rows, hash} (CERT_OUT json artifact)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            results[name] = {"status": "FAIL", "error": f"spark: {ex}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            results[name] = {"status": "ROWS_ONLY", "rows": len(s_rows)}
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            results[name] = {"status": "FAIL", "error": f"duckdb: {ex}"}
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            results[name] = {"status": "FAIL", "error": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            results[name] = {
                "status": "PASS",
                "rows": len(s_rows),
                "value_hash": sh,  # already computed for the compare
            }
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    cert_out = os.environ.get("CERT_OUT")
    if cert_out:
        import json
        import time

        with open(cert_out, "w") as fh:
            json.dump(
                {
                    "run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "sf_dir": sf_dir,
                    "strict_floats": STRICT_FLOATS,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {cert_out}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
