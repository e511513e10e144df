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


def family(t):
    """Collapse an arrow type to the driver-equivalent dtype family.

    int8..int64 all land in int64 under the driver's materialization, so
    they are one family; decimal128 (DuckDB HUGEINT) is NOT — it comes
    back float64/object and hash-mismatches Spark's int64 even when every
    value is numerically equal (the q_llm_pack r7 failure class).
    """
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct{" + ",".join(
            f.name + ":" + family(f.type) for f in t) + "}"
    return str(t)


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
        # The driver's compare is TYPED: an uncast DuckDB HUGEINT (e.g. a
        # window sum, arrow decimal128) materializes as float64 while Spark
        # writes int64 -> hash mismatch even when every value is equal.
        # Both sides here come through the same DuckDB->arrow path, so
        # comparing arrow-type FAMILIES per column catches that class early.
        # Integer widths (int8..int64) are equivalent under the driver's
        # materialization; decimal (HUGEINT) is NOT an integer family and
        # must fail against Spark's int64.
        dtbad = [(c, str(odf.column(c).type), str(sdf.column(c).type))
                 for c in ocols
                 if family(odf.column(c).type) != family(sdf.column(c).type)]
        if dtbad:
            print(f"FAIL {key}: dtype mismatch (oracle vs spark): {dtbad}")
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
