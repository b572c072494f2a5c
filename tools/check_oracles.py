"""Local replica of the driver's correctness check: run each
``queries()[name]`` on Spark and ``oracle_sql()[name]`` on DuckDB at
sf0.01, compare row count + schema (column names) + order-insensitive
values. Usage: python tools/check_oracles.py [name ...]"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# Types the driver's value-hash treats identically on both engines.  DuckDB
# HUGEINT (int128, the default type of sum(BIGINT)) and DECIMAL hash
# differently from Spark BIGINT even when every value is equal — the r4
# driver redded four value-exact queries this way.  Oracles must CAST.
ALLOWED_DUCK_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN"}
FORBIDDEN_DUCK_TYPES = {"HUGEINT", "DECIMAL"}


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # collapse -0.0 / 0.0 only; no precision collapse
        return repr(v)  # full float64 precision, driver-faithful
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    import __spark_entry__ as entrymod
    from fluent_bit_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for tb in TABLES:
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{tb}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        bad_types = [(c, t) for c, t in zip(ocols, otypes)
                     if any(t.startswith(f) for f in FORBIDDEN_DUCK_TYPES)]
        if bad_types:
            print(f"FAIL  {name}: oracle column types the driver hash cannot "
                  f"match against Spark: {bad_types} — CAST them")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: schema {sorted(scols)} != {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            ok = False
        else:
            a = canon([tuple(r) for r in srows], scols)
            b = canon(orows, ocols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch, e.g. {diffs}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
