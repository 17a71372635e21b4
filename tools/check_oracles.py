#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against SparkEntry.oracleSql in DuckDB and hash-compare, mirroring the
driver conventions (views named after the sf-dir parquet tables; columns
sorted by name before hashing; values compared after canonicalization).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.6f}")
            elif isinstance(v, bool):
                cells.append(str(int(v)))
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        rows = len(spark_df) == len(odf)
        schema = sorted(spark_df.columns) == sorted(odf.columns)
        h = canon(spark_df) == canon(odf) if rows and schema else False
        results[name] = ("OK" if (rows and schema and h) else
                         f"MISMATCH rows={rows}({len(spark_df)}/{len(odf)}) "
                         f"schema={schema} hash={h}")
    bad = 0
    for k, v in results.items():
        print(f"{k:24s} {v}")
        bad += (v != "OK")
    print(f"--- {len(results)-bad}/{len(results)} OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
