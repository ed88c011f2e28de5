#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (Spark result),
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    with views over <sfDir>/*.parquet,
  - compares row count, sorted column names, and exact values in order.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query names {sorted(unknown)}")
        sys.exit(1)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        # dtype contract: DuckDB-level types must agree (pandas coerces
        # e.g. DATE vs TIMESTAMP to the same datetime64 and would hide it)
        st = dict(con.sql(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
        ).df()[["column_name", "column_type"]].values)
        dt = dict(con.sql(f"DESCRIBE {sql}")
                  .df()[["column_name", "column_type"]].values)
        mismatch = [c for c in sc if st.get(c) != dt.get(c)]
        if mismatch:
            print(f"FAIL {name}: dtypes "
                  + ", ".join(f"{c}: spark={st.get(c)} duck={dt.get(c)}"
                              for c in mismatch))
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        s = spark_df[sc].values.tolist()
        d = duck_df[dc].values.tolist()
        bad = None
        for i, (r1, r2) in enumerate(zip(s, d)):
            if [norm(x) for x in r1] != [norm(x) for x in r2]:
                bad = (i, r1, r2)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
