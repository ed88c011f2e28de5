#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (Spark result),
  - runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
    with views over <sfDir>/*.parquet,
  - compares row count, sorted column names, and exact values in order.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]

Known representational limit (shared with the driver's gate): both
results flow through pandas, where a DOUBLE NULL and a NaN are the
same value — a spark-NULL vs oracle-NaN divergence is invisible on
BOTH engines identically. Queries avoid emitting raw NaN (the
fixed-point quantization idiom) so the class stays theoretical.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # LIST-typed result cells come back from .df() as numpy arrays;
    # normalize containers recursively to tuples so row comparison is
    # deterministic instead of raising "truth value of an array ... is
    # ambiguous" and aborting the whole gate mid-run (round-12 review)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    if len(sys.argv) < 3:
        print("usage: check.py <sfDir> <outDir> [query ...]",
              file=sys.stderr)
        sys.exit(2)
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
        # metadata checks FIRST: DESCRIBE binds without executing, so a
        # missing output, an oracle binder error, or a column/dtype
        # mismatch fails before either side pays the full query
        try:
            st_df = con.sql(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            dt_df = con.sql(f"DESCRIBE {sql}").df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc = sorted(st_df["column_name"])
        dc = sorted(dt_df["column_name"])
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        # dtype contract: DuckDB-level types must agree (pandas coerces
        # e.g. DATE vs TIMESTAMP to the same datetime64 and would hide it)
        st = dict(st_df[["column_name", "column_type"]].values)
        dt = dict(dt_df[["column_name", "column_type"]].values)
        mismatch = [c for c in sc if st.get(c) != dt.get(c)]
        if mismatch:
            print(f"FAIL {name}: dtypes "
                  + ", ".join(f"{c}: spark={st.get(c)} duck={dt.get(c)}"
                              for c in mismatch))
            n_fail += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output read error ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        s = spark_df[sc].values.tolist()
        d = duck_df[dc].values.tolist()
        bad = None
        try:
            for i, (r1, r2) in enumerate(zip(s, d)):
                if [norm(x) for x in r1] != [norm(x) for x in r2]:
                    bad = (i, r1, r2)
                    break
        except Exception as e:
            # a comparison that cannot even be evaluated is a FAIL for
            # THIS query, never an abort of the remaining gate
            bad = ("cmp-error", str(e)[:200], "")
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    # zero queries checked is a vacuous green (an emptied oracleSql
    # would otherwise sail through CI) — same class as the unknown-name
    # guard above (round-12 review)
    if n_pass == 0 and n_fail == 0:
        print("FAIL: zero queries checked — oracle_sql.json empty?")
        sys.exit(1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
