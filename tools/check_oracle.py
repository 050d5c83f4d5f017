"""Self-serve replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive multiset of
normalized row values.  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries.

Two comparison stages:

1. Value stage (``norm_rows``) — Python-level normalization through
   ``collect()``/``fetchall()``; catches genuine wrong answers with readable
   diffs.
2. Pandas stage (``pandas_canon``) — mimics the DRIVER's canonicalizer, which
   materializes both sides as pandas DataFrames, sorts rows with
   ``sort_values`` over name-sorted columns, and hashes values
   dtype-sensitively.  This stage catches two bug classes the value stage
   cannot see: (a) DuckDB integer widening (``SUM(BIGINT)`` → HUGEINT →
   pandas float64 while Spark emits int64 — identical values, different
   hash), and (b) unhashable object cells (list/dict columns that make the
   driver's ``sort_values`` raise ``TypeError``).
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_value(x)) for k, x in v.items()))
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_value(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


def _dtype_class(kind: str) -> str:
    """Collapse numpy dtype kinds into the classes the driver's hash separates.

    Signed/unsigned ints hash alike; int vs float vs bool vs object vs
    datetime do not (int64 ``57`` != float64 ``57.0`` under a
    dtype-sensitive hash).
    """
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "datetime"}.get(
        kind, "object"
    )


def pandas_canon(pdf):
    """Driver-style canonicalization: name-sorted columns, ``sort_values``
    over every column.  Raises TypeError on unhashable cells — exactly like
    the driver — so callers can surface it as an ``err`` row.
    Returns (canonical_df, {col: dtype_class}).
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return pdf, {c: _dtype_class(pdf[c].dtype.kind) for c in cols}


def main() -> int:
    import __spark_entry__ as entrymod
    from datalake2anomali_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            # The driver canonicalizes rows-only results too (that is how an
            # unhashable array column becomes an `err` row) — mimic it.
            try:
                pandas_canon(sdf.toPandas())
            except TypeError as e:
                print(f"FAIL {name}: rows-only result not pandas-canonicalizable (driver err): {e}")
                failures.append(name)
                continue
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {spark_s:.1f}s) — no oracle")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ  spark={sc}  duckdb={dc}")
            failures.append(name)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: row count  spark={len(sr)}  duckdb={len(dr)}")
            failures.append(name)
            continue
        if sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            failures.append(name)
            continue
        # Driver-faithful pandas stage: dtype-sensitive, sort_values-based.
        try:
            _, skinds = pandas_canon(sdf.toPandas())
        except TypeError as e:
            print(f"FAIL {name}: spark side not pandas-canonicalizable (driver err): {e}")
            failures.append(name)
            continue
        try:
            _, dkinds = pandas_canon(con.execute(oracles[name]).df())
        except TypeError as e:
            print(f"FAIL {name}: oracle side not pandas-canonicalizable (driver err): {e}")
            failures.append(name)
            continue
        if skinds != dkinds:
            diff = {c: (skinds[c], dkinds.get(c)) for c in skinds if skinds[c] != dkinds.get(c)}
            print(f"FAIL {name}: pandas dtype class mismatch (driver hash-fail): {diff}")
            failures.append(name)
            continue
        print(f"PASS {name}: {len(sr)} rows, spark {spark_s:.1f}s")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match the DuckDB oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
