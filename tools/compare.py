#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads <outDir>/<query>/ parquet (Spark results) + <outDir>/oracle_sql.json,
runs each oracle in DuckDB against the testdata tables, and compares:
columns sorted by name, rows sorted, exact value equality (floats exact —
if this passes, any reasonable hash matches).

Usage: compare.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver rungs are single files; ScaleUp rungs (testdata-sf10/
        # sf100, used by the r12 cross-rung insurance) are Spark-written
        # DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # every query Verify attempted must have produced an output dir —
    # a query that throws in Verify writes nothing, and iterating only
    # over existing dirs would silently drop it from the gate
    roster_path = os.path.join(out_dir, "queries.json")
    expected = set(json.load(open(roster_path))) if os.path.exists(roster_path) \
        else set(oracles)
    present = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(expected - present):
        if only and name not in only:
            continue
        print(f"FAIL {name}: no spark output (query crashed in Verify?)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        try:
            res = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
            spark_cols = [d[0] for d in res.description]
            spark_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok" if len(spark_rows) >= 0 else "??"
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows [{status}]")
            n_rows_only += 1
            continue
        try:
            ores = con.execute(oracles[name])
            o_cols = [d[0] for d in ores.description]
            o_rows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sk = frame_key(spark_rows, spark_cols)
        ok = frame_key(o_rows, o_cols)
        if sk[0] != ok[0]:
            print(f"FAIL {name}: column mismatch spark={sk[0]} duck={ok[0]}")
            n_fail += 1
        elif sk[1] != ok[1]:
            diffs = [(a, b) for a, b in zip(sk[1], ok[1]) if a != b]
            print(f"FAIL {name}: {len(spark_rows)} vs {len(o_rows)} rows; first diffs:")
            for a, b in diffs[:3]:
                print(f"   spark={a}\n   duck ={b}")
            if len(spark_rows) != len(o_rows):
                print(f"   (row counts differ)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
