#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over the testdata
parquet, loads the Spark result parquet written by graft.Verify, and
compares: columns sorted by name, rows sorted by all columns, exact value
equality (NaN==NaN). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Default memory_limit is 80% of host RAM PER PROCESS: two
    # concurrent gate runs (or a gate next to Spark JVMs) can OOM the
    # box and surface as phantom "oracle error" FAILs (seen at the 50k-
    # doc scale corpus, round 10). Cap at half the host RAM instead —
    # low caps just shift the blowup to disk spill (a 32GB cap spilled
    # >80GB of duckdb_temp_storage on the same corpus and filled the
    # disk). Spill goes to the system tmpdir, never the cwd/repo.
    # Insertion order is irrelevant because rows are sorted before
    # compare.
    # GRAFT_ORACLE_MEM_GB overrides for a dedicated box: the q101
    # oracle's recursive-closure chain wants ~100GB of workspace at the
    # 50k-doc corpus — beyond half-RAM it needs the full machine (run
    # it alone), NOT a bigger spill (it out-spills a 60GB disk).
    half_ram_gb = int(os.environ.get("GRAFT_ORACLE_MEM_GB") or
                      max(8, (os.sysconf("SC_PAGE_SIZE")
                              * os.sysconf("SC_PHYS_PAGES")) // (2 << 30)))
    con.execute(f"SET memory_limit='{half_ram_gb}GB'")
    con.execute("SET preserve_insertion_order=false")
    import tempfile
    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            n_fail += 1
            continue
        etypes = {n: str(exp.schema.field(n).type) for n in ecols}
        gtypes = {n: str(got.schema.field(n).type) for n in gcols}
        tdiff = {n: (etypes[n], gtypes[n]) for n in ecols if etypes[n] != gtypes[n]}
        erows = sorted([tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()],
                       key=lambda r: tuple(str(x) for x in r))
        grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()],
                       key=lambda r: tuple(str(x) for x in r))
        if erows != grows:
            print(f"FAIL {name}: {len(erows)} oracle rows vs {len(grows)} spark rows")
            for i, (a, b) in enumerate(zip(erows, grows)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n    oracle: {a}\n    spark : {b}")
                    break
            else:
                if len(erows) != len(grows):
                    print(f"  row-count mismatch only")
            n_fail += 1
        elif tdiff:
            print(f"WARN {name}: values match; dtypes differ: {tdiff}")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
