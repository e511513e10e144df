#!/usr/bin/env python3
"""Local dev-loop oracle compare (mimics the driver's t2 gate).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [key ...]

Reads <verifyOutDir>/oracle_sql.json, registers every corpus table as a
DuckDB view over <sfDir>/*.parquet, runs each oracle SQL, reads the
Spark result parquet at <verifyOutDir>/<key>/, sorts columns by name on
both sides, and compares row-by-row values exactly (floats via repr
after float() coercion; NaN==NaN).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return [canon(x) for x in v]
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        try:
            odf = con.execute(sql).fetch_arrow_table()
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {key}: exec error: {e}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
        if ocols != scols:
            print(f"FAIL {key}: schema mismatch oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orows = [[canon(v) for v in row] for row in
                 zip(*[odf.column(c).to_pylist() for c in ocols])]
        srows = [[canon(v) for v in row] for row in
                 zip(*[sdf.column(c).to_pylist() for c in scols])]
        if len(orows) != len(srows):
            print(f"FAIL {key}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = [(i, o, s) for i, (o, s) in enumerate(zip(orows, srows)) if o != s]
        if bad:
            i, o, s = bad[0]
            print(f"FAIL {key}: {len(bad)}/{len(orows)} rows differ; "
                  f"first @row {i}:\n  cols:   {ocols}\n  oracle: {o}\n  spark:  {s}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
