"""Local replica of the driver's correctness gate.

Runs every declared query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from physioview_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [row.asDict() for row in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        dcols = ddf.column_names
        drows = ddf.to_pylist()
        problems = []
        if set(scols) != set(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        else:
            a = normalize(srows, scols)
            b = normalize(drows, dcols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(
                    f"{len(diffs)} value mismatches; first: "
                    f"spark={diffs[0][0]!r} duck={diffs[0][1]!r}"
                )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
