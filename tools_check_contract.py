"""Local mimic of the driver's CORRECTNESS gate: run each queries()
entry and its oracle_sql() side-by-side, compare row-count + sorted
column names + order-insensitive value multiset. Usage:

    python tools_check_contract.py [sf_dir] [only_query ...]
"""

import sys
import time

import duckdb
import pandas as pd

from addresses_importer_spark.plans.driver_queries import ORACLES, QUERIES
from addresses_importer_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Type-strict normalization: an int64 2011 and a float64 2011.0 must
    NOT compare equal — the driver's value hash distinguishes them (it
    broke collision_count in round 1; DuckDB HUGEINT -> float64 via
    fetchdf). Floats carry an 'f:' tag so int-vs-float divergence fails
    here exactly like it fails there."""
    import numpy as np

    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return f"f:{float(v):.6g}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_key(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        t1 = time.time()
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        t2 = time.time()
        scols, srows = frame_key(sdf)
        ocols, orows = frame_key(odf)
        status = "ok"
        if scols != ocols:
            status = f"COLS MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            status = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diff_s = [r for r in srows if r not in set(map(tuple, orows))][:3]
            diff_o = [r for r in orows if r not in set(map(tuple, srows))][:3]
            status = f"VALUES MISMATCH spark_only={diff_s} oracle_only={diff_o}"
        tag = "PASS" if status == "ok" else "FAIL"
        if tag == "FAIL":
            failures.append(name)
        print(f"{tag} {name}: rows={len(srows)} spark={t1-t0:.1f}s oracle={t2-t1:.1f}s {status if tag=='FAIL' else ''}")

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES) if not only else len(only)} passed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
