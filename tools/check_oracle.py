"""Local replica of the driver's correctness gate: run every registered
workload on Spark AND its DuckDB oracle at a given sf dir, compare
row-count + column names + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), sorted(cols), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from pyspark.sql import SparkSession
    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.schema import TESTDATA_TABLES
    from sample_data_pipeline_project_spark.workloads import load_all

    spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry = load_all()
    failures = []
    for name, w in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = w.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        t1 = time.time()
        if w.oracle is None:
            print(f"skip  {name}: no oracle ({len(srows)} rows, {t1-t0:.1f}s)")
            continue
        try:
            rel = con.sql(w.oracle)
            # The driver's canonicalization distinguishes int64 from int128:
            # an un-cast SUM(BIGINT) yields HUGEINT in DuckDB and hash-mismatches
            # even when values are identical (round-1 root cause). Catch locally.
            bad = [
                c
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            ]
            if bad:
                print(f"FAIL  {name}: oracle HUGEINT column(s) {bad} — add CAST(... AS BIGINT)")
                failures.append(name)
                continue
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        t2 = time.time()
        sn, sc, sh = canon_rows(scols, srows)
        dn, dc, dh = canon_rows(dcols, drows)
        status = "ok" if (sn, sc, sh) == (dn, dc, dh) else "FAIL"
        print(
            f"{status:5} {name}: spark {sn} rows {t1-t0:.1f}s | duck {dn} rows {t2-t1:.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if sc != dc:
                print(f"      cols spark={sc}\n      cols duck ={dc}")
            elif sn != dn:
                print(f"      rowcount spark={sn} duck={dn}")
            else:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(canon_value(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(canon_value(r[i]) for i in dorder) for r in drows)
                diffs = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"      spark: {a}\n      duck : {b}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
