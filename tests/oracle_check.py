"""Self-check harness mimicking the driver's correctness gate:
run each catalog query on Spark AND its oracle on DuckDB, compare
row count + column names + order-insensitive values.

Usage:  python3 tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import Counter
from datetime import date, datetime

import duckdb


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb float repr noise beyond 9 significant decimals
        return round(v, 9)
    if isinstance(v, (datetime, date)):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def rows_to_multiset(cols: list[str], rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def check_query(spark, con, name: str, entry, sf_dir: str) -> tuple[bool, str]:
    sdf = entry.run(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if entry.oracle is None:
        return True, f"rows-only: {len(spark_rows)} rows"
    odf = con.sql(entry.oracle)
    oracle_cols = [d[0] for d in odf.description]
    oracle_rows = odf.fetchall()
    problems = []
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count {len(spark_rows)} != {len(oracle_rows)}")
    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"columns {sorted(spark_cols)} != {sorted(oracle_cols)}")
    if not problems:
        s = rows_to_multiset(spark_cols, [[r[c] for c in spark_cols] for r in spark_rows])
        o = rows_to_multiset(oracle_cols, oracle_rows)
        if s != o:
            diff_s = list((s - o).items())[:3]
            diff_o = list((o - s).items())[:3]
            problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    if problems:
        return False, "; ".join(problems)
    return True, f"OK ({len(spark_rows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from streamsql_spark.catalog import CATALOG
    from streamsql_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, entry in CATALOG.items():
        if only and name not in only:
            continue
        try:
            ok, msg = check_query(spark, con, name, entry, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if ok else "FAIL"
        print(f"{status:4} {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(CATALOG) - len(failed)}/{len(CATALOG) if not only else len(only)} passed")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
