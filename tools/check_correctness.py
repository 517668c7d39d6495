"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares against oracle_sql() via DuckDB: row count, column names,
and an order-insensitive value comparison (exact strings for
non-floats; floats compared to 1e-9 relative tolerance and flagged if
they differ at all, since the driver may hash exactly).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from rsyslog_spark import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def typed_mismatches(con, sql, ocols, spark_dtypes):
    """Flag DuckDB HUGEINT/DECIMAL columns whose Spark twin is integral.

    The driver's value hash renders DuckDB HUGEINT (what SUM(BIGINT)
    returns) and DECIMAL differently from Spark BIGINT even when the
    values are numerically equal; canon() stringifies both to the same
    text, so without this check the local gate passes what the driver
    fails (verdict r5 finding #1, dynstats_lifecycle_totals).
    """
    try:
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    except Exception:
        return []
    out = []
    for row in desc:
        cname, dtype = row[0], str(row[1]).upper()
        st = spark_dtypes.get(cname)
        if st in SPARK_INTEGRAL and (
                dtype in ("HUGEINT", "INT128", "UHUGEINT")
                or dtype.startswith("DECIMAL")):
            out.append(
                f"typed mismatch col={cname}: oracle {dtype} vs spark "
                f"{st} (driver hash differs; CAST the oracle to BIGINT)")
    return out


def rows_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("check_correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        problems += typed_mismatches(con, oracles[name], ocols,
                                     dict(sdf.dtypes))
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sk = rows_key([tuple(r) for r in srows], scols)
            ok = rows_key(orows, ocols)
            if sk != ok:
                # find first differing row for the report
                diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
