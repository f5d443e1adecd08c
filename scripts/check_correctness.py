"""Local stand-in for the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive canonicalized value multiset.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hadith_vector_search_spark.registry import get_oracles, get_queries  # noqa: E402
from hadith_vector_search_spark.session import get_spark  # noqa: E402
from hadith_vector_search_spark.testing import compare_query, duckdb_connect_views  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb_connect_views(sf_dir)

    queries, oracles = get_queries(), get_oracles()
    n_pass = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"WARN {name}: no oracle (rows-only check) rows={n}")
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: spark error: {e}")
                n_fail += 1
            continue
        try:
            problems = compare_query(spark, con, fn, oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
