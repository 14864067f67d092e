#!/usr/bin/env python3
"""Show the first differing rows between a Spark result parquet and its
DuckDB oracle for ONE query — the drill-down the all-registry checker
(check_correctness.py) doesn't print. Usage:

    python3 tools/diff_query.py <sf_dir> <out_dir> <query_name> [max_diffs]
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def main(sf_dir, out_dir, name, max_diffs=10):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    exp = con.execute(oracle[name]).fetch_arrow_table()
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    print(f"columns: oracle={ecols} spark={gcols}")
    etypes = {n: str(exp.schema.field(n).type) for n in ecols}
    gtypes = {n: str(got.schema.field(n).type) for n in gcols}
    for n in ecols:
        if n in gtypes and etypes[n] != gtypes[n]:
            print(f"  dtype differs {n}: oracle={etypes[n]} spark={gtypes[n]}")
    erows = sorted([tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()],
                   key=lambda r: tuple(str(x) for x in r))
    grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()],
                   key=lambda r: tuple(str(x) for x in r))
    print(f"rows: oracle={len(erows)} spark={len(grows)}")
    eset, gset = set(erows), set(grows)
    only_e = [r for r in erows if r not in gset]
    only_g = [r for r in grows if r not in eset]
    print(f"oracle-only rows: {len(only_e)}, spark-only rows: {len(only_g)}")
    for r in only_e[:max_diffs]:
        print("  oracle-only:", r)
    for r in only_g[:max_diffs]:
        print("  spark-only: ", r)
    # Pair up positionally for the common same-rowcount value-drift case.
    if len(erows) == len(grows):
        shown = 0
        for e, g in zip(erows, grows):
            if e != g and shown < max_diffs:
                print("  pairdiff oracle:", e)
                print("           spark: ", g)
                shown += 1


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 10)
