#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against the raw tables in
<sfDir>, and compares row counts, sorted column names, and sorted values.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir, only=None, skip_oracle=()):
    con = duckdb.connect()
    # large-SF oracles (the recursive-CTE replays at organic sf1) exceed
    # DuckDB's default in-memory budget — allow spilling instead of dying
    # with an allocation failure mid-oracle. NOTE the spill is not a full
    # fix: recursive-CTE working state is NOT spillable, so q40's vincenty
    # replay at organic sf1 can still die host-dependently. The sf>=1
    # protocol is therefore a FORMAL SUBSTITUTION, not a dice roll: run
    # with --skip-oracle=q40_best_location and let the sampled twin q118
    # (same vincenty election chain, bounded sample) carry the oracle —
    # recorded in SCALING §6d and the verify recipe.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("PRAGMA memory_limit='80GB'")
    for t in TABLES:
        # driver testdata = single files; Spark-written trees (e.g. the
        # organic sf1 from `Dev gensf1`) = directories of part files
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if only and not any(p in name for p in only):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name in skip_oracle:
            # declared substitution (e.g. q40 at sf>=1: oracle replay is
            # a recursive CTE DuckDB cannot bound; q118 covers the chain).
            # Still a rows>0 gate — an empty result is an engine failure,
            # not a substitution.
            if len(got) > 0:
                print(f"SUBST {name}: {len(got)} rows "
                      f"(oracle formally substituted at this SF)")
                n_rows_only += 1
            else:
                print(f"FAIL {name}: empty result under oracle substitution")
                n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS" if len(got) > 0 else "EMPTY"
            print(f"{status} {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got_cols) == sorted(exp_cols)
        ok_vals = ok_rows and ok_cols and \
            table_key(got, got_cols) == table_key(exp, exp_cols)
        if ok_vals:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}, "
                  f"cols {sorted(got_cols)} vs {sorted(exp_cols)}, "
                  f"vals_match={ok_vals}")
            if ok_rows and ok_cols:
                a = table_key(got, got_cols)
                b = table_key(exp, exp_cols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"  spark={x}\n  duck ={y}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd+ args: substring filters to re-check specific queries;
    # --skip-oracle=a,b declares formal oracle substitutions (exact names)
    flags = [a for a in sys.argv[3:] if a.startswith("--")]
    rest = [a for a in sys.argv[3:] if not a.startswith("--")]
    skip = tuple(x for f in flags if f.startswith("--skip-oracle=")
                 for x in f.split("=", 1)[1].split(",") if x)
    sys.exit(main(sys.argv[1], sys.argv[2], rest or None, skip))
