"""Driver-style correctness sweep: run every queries() entry on Spark
and, where an oracle exists, the DuckDB SQL side-by-side at sf0.01;
compare row counts, column names/types, and sorted value tuples
(columns sorted by name, like the driver's hash).

Usage: python tools/oracle_sweep.py [query ...]
Env: SPARK_GRAFT_SWEEP_SF overrides the table directory (default
/root/testdata/sf0.01) — used by the sf1 scale-up spot-check over
tools/make_sf1.py's derived tables.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from microdata_rdf_streaming_parser_js_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return repr(tuple(canon(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, os_ = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            s_cols = sorted(sdf.columns)
            s_rows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"rows {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(os_[name])
            d_cols = sorted(d[0] for d in cur.description)
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = s_cols == d_cols
        ok_n = len(s_rows) == len(d_rows)
        sc = rows_canon([tuple(r) for r in s_rows], sdf.columns)
        dc = rows_canon(d_rows, [d[0] for d in cur.description])
        ok_vals = sc == dc
        status = "OK  " if (ok_cols and ok_n and ok_vals) else "FAIL"
        print(f"{status} {name}: n={len(s_rows)}/{len(d_rows)} "
              f"cols={'ok' if ok_cols else f'{s_cols} vs {d_cols}'} "
              f"vals={'ok' if ok_vals else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if not ok_vals and ok_n:
                for a, b in zip(sc, dc):
                    if a != b:
                        print(f"  first diff:\n   spark={a}\n   duck ={b}")
                        break
    print("SWEEP", "FAIL: " + ", ".join(failures) if failures else "ALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
