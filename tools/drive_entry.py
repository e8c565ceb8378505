"""Driver-mimic: run entry() smoke + full queries() vs oracle_sql() diff."""
import math
import sys, time

sys.path.insert(0, "/root/repo")


def norm(v):
    """Normalize a cell the way the driver's pandas hash effectively
    does: nulls (None/NaN) unify, list-likes (Spark list vs duckdb
    numpy array) unify, integral floats drop the .0."""
    if hasattr(v, "tolist"):
        v = v.tolist()  # numpy scalar -> python scalar, ndarray -> list
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if v is None:
        return "NULL"
    try:
        import pandas as pd

        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float) and not math.isnan(v) and v == int(v):
        return str(int(v))
    return str(v)

import duckdb
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive-entry")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    
    import __spark_entry__ as e
    
    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows", flush=True)
    assert len(rows) > 0
    
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    
    qs = e.queries()
    oracles = e.oracle_sql()
    fails = []
    t_all = time.time()
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF01)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            )
            if name not in oracles:
                print(f"  rows-only {name}: {len(srows)} rows", flush=True)
                continue
            odf = con.execute(oracles[name]).df()
            ocols = sorted(odf.columns)
            orows = sorted(
                tuple(norm(odf[c].iloc[i]) for c in ocols) for i in range(len(odf))
            )
            ok_cols = scols == ocols
            ok_rows = len(srows) == len(orows)
            ok_vals = srows == orows
            if not (ok_cols and ok_rows and ok_vals):
                fails.append((name, ok_cols, ok_rows, ok_vals))
                print(f"  FAIL {name}: cols={ok_cols} rows={ok_rows} vals={ok_vals}", flush=True)
        except Exception as ex:
            fails.append((name, "err", str(ex)[:200]))
            print(f"  ERR {name}: {str(ex)[:200]}", flush=True)
    print(f"checked {len(qs)} queries in {time.time()-t_all:.0f}s; fails: {len(fails)}")
    for f in fails:
        print("  ", f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
