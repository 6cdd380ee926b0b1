"""Driver-gate simulation: run every __spark_entry__.queries() entry at
a given sf and compare against oracle_sql() via DuckDB — row count,
column names, and order-insensitive values.

DEFAULT comparison is EXACT STRINGIFIED equality, mirroring the
driver's value-hash: the driver stringifies every cell and hashes, so
a 1-ulp float difference (or int64 vs float64) is a real red there.
Round 3 proved the gap: this tool's old 1e-12-tolerance compare stayed
green on `unigram_logprob_docs` while the driver hashed it red
(VERDICT.md r3 "What's wrong" #3).  Use ``--tol`` to opt back into the
tolerant compare as a DIAGNOSTIC (it tells you whether a red is a
rounding ulp or a real value bug) — never as the acceptance gate.

Usage: python tools/check_oracles.py [--tol] [sf_dir] [only_query_name]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

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


def row_eq_exact(a, b):
    """Driver parity: every cell must STRINGIFY identically (so float
    bit differences and int-vs-float type drift both fail)."""
    return (len(a) == len(b)
            and all(type(x) is type(y) and str(x) == str(y)
                    for x, y in zip(a, b)))


def row_eq_tol(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) or isinstance(y, float):
            if x is None or y is None:
                if x is not y:
                    return False
            elif isinstance(x, float) != isinstance(y, float):
                return False
            elif not (x == y or math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)):
                return False
        elif x != y:
            return False
    return True


def compare(cols, rows, ocols, orows, exact=True):
    """Compare a Spark result against an oracle result the way the
    driver does.  Returns a list of problem strings (empty = green)."""
    problems = []
    if sorted(cols) != sorted(ocols):
        problems.append(f"schema mismatch: spark={sorted(cols)} oracle={sorted(ocols)}")
    if len(rows) != len(orows):
        problems.append(f"row count: spark={len(rows)} oracle={len(orows)}")
    if not problems:
        a, b = norm_rows(cols, rows), norm_rows(ocols, orows)
        eq = row_eq_exact if exact else row_eq_tol
        bad = [(x, y) for x, y in zip(a, b) if not eq(x, y)]
        if bad:
            problems.append(f"value mismatch ({len(bad)} rows), first: {bad[0]}")
    return problems


def main():
    args = [a for a in sys.argv[1:]]
    exact = "--tol" not in args
    args = [a for a in args if a != "--tol"]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    only = args[1] if len(args) > 1 else None

    import __spark_entry__ as E
    from pandarus_spark.session import build_session

    spark = build_session(app="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    mode = "exact(stringified, driver-parity)" if exact else "tol(1e-12 diagnostic)"
    print(f"comparison mode: {mode}")
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
        problems = compare(cols, rows, ocols, orows, exact=exact)
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
