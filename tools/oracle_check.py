"""Oracle-parity harness: mimics the driver's DuckDB comparison.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` mirror on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows stringified
and sorted). Usage::

    python3 tools/oracle_check.py            # all queries
    python3 tools/oracle_check.py q1 asof    # substring filter
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full-precision canon (VERDICT r05 #3): the driver hashes full
        # precision, so the mirror must too — %.10g hid the one real
        # double-rounding divergence (interarrival_events) for two rounds.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v)).lower()
    try:  # numpy scalars / arrays
        import numpy as np
        if isinstance(v, np.ndarray):
            return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            return canon(v.item())
    except ImportError:
        pass
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    filters = sys.argv[1:]
    import __spark_entry__ as entrymod
    from fs2_data_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle_check", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "16g"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    n_pass = n_fail = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in os_:
                print(f"  {name:32s} rows={len(srows):6d}  (no oracle — rows-only)")
                n_pass += 1
                continue
            d = con.sql(os_[name])
            dcols, drows = list(d.columns), d.fetchall()
            ok_n = len(srows) == len(drows)
            ok_c = sorted(scols) == sorted(dcols)
            ok_v = ok_n and ok_c and rows_to_multiset(scols, srows) == rows_to_multiset(dcols, drows)
            status = "OK " if (ok_n and ok_c and ok_v) else "FAIL"
            print(f"  {name:32s} rows={len(srows):6d}/{len(drows):6d} "
                  f"cols={'ok' if ok_c else f'{scols} vs {dcols}'} values={'ok' if ok_v else 'MISMATCH'}  {status}")
            if ok_n and ok_c and ok_v:
                n_pass += 1
            else:
                n_fail += 1
                if ok_n and ok_c:
                    a = rows_to_multiset(scols, srows)
                    b = rows_to_multiset(dcols, drows)
                    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    for x, y in diffs:
                        print(f"      spark: {x[:160]}")
                        print(f"      duck : {y[:160]}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"  {name:32s} ERROR {type(e).__name__}: {str(e)[:200]}")
    print(f"\n{n_pass} passed, {n_fail} failed of {len(names)}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
