"""Driver-gate simulation: run every __spark_entry__.queries() entry at
a given sf and compare against oracle_sql() via DuckDB — row count,
column names, and order-insensitive values (doubles compared exactly,
as the oracles are engineered for bit parity).

Usage: python tools/check_oracles.py [sf_dir] [only_query_name]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from pandarus_spark.session import build_session  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_rows(cols, rows):
    import decimal
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        # DuckDB DECIMAL results reach the driver as float64 via Arrow —
        # coerce the same way here (int-vs-float strictness stays)
        out.append(tuple(float(v) if isinstance(v, decimal.Decimal) else v
                         for v in (d[c] for c in sorted(cols))))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def row_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) or isinstance(y, float):
            if x is None or y is None:
                if x is not y:
                    return False
            # The driver hashes stringified values, so an int64 99111 on one
            # side vs a float64 99111.0 on the other is a REAL mismatch even
            # though the values are numerically equal.  Mirror that.
            elif isinstance(x, float) != isinstance(y, float):
                return False
            elif not (x == y or math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)):
                return False
        elif x != y:
            return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else None

    spark = build_session(app="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name != only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"[FAIL] {name}: spark error {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(rows)} rows, cols={cols}")
            if len(rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"[FAIL] {name}: oracle error {ex}")
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema mismatch: spark={sorted(cols)} oracle={sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"row count: spark={len(rows)} oracle={len(orows)}")
        if not problems:
            a, b = norm_rows(cols, rows), norm_rows(ocols, orows)
            bad = [(x, y) for x, y in zip(a, b) if not row_eq(x, y)]
            if bad:
                problems.append(f"value mismatch ({len(bad)} rows), first: {bad[0]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            print(f"[OK]   {name}: {len(rows)} rows match oracle")

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        for n, p in failures:
            print(" -", n, ":", p[:300])
        sys.exit(1)
    print("ALL ORACLE CHECKS PASS")
    spark.stop()


if __name__ == "__main__":
    main()
