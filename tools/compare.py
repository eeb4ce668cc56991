#!/usr/bin/env python3
"""Dev-side oracle parity check, mimicking the driver: run each oracle SQL
in DuckDB over the sf dir's parquet tables, compare with the Spark result
parquet (columns sorted by name, rows sorted, values compared)."""
import sys, json, glob, math
import duckdb


def connect_views(sfdir):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


if sys.argv[1:2] == ["--parse-only"]:
    # EXPLAIN (parse + bind, no execution) every oracle SQL in the given
    # JSON file against the sf dir's views. Lets `sbt test` catch a
    # broken oracle string (the r4 failure mode: bad SQL compiles fine
    # as a Scala literal and only dies at driver time).
    sfdir, path = sys.argv[2], sys.argv[3]
    con = connect_views(sfdir)
    fail = 0
    for q, sql in sorted(json.load(open(path)).items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            print(f"FAIL {q}: {type(e).__name__}: {e}")
            fail += 1
    print(f"parse-only: {fail} fail")
    sys.exit(1 if fail else 0)

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional trailing query names: compare only those (pairs with
# `graft.Verify <sfDir> <outDir> <q...>` subset dumps)
only = set(sys.argv[3:])

con = connect_views(sfdir)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
unknown = only - set(oracle)
if unknown:
    sys.exit(f"unknown query name(s): {sorted(unknown)}")
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {e}")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {q}: spark result missing: {e}")
        fail += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {q}: columns want={list(want.columns)} got={list(got.columns)}")
        fail += 1
        continue
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(w) != len(g):
        print(f"FAIL {q}: rows want={len(w)} got={len(g)}")
        fail += 1
        continue
    mismatch = None
    for c in w.columns:
        for i, (a, b) in enumerate(zip(w[c], g[c])):
            if isinstance(a, float) and isinstance(b, float):
                if not (a == b or (math.isnan(a) and math.isnan(b))):
                    mismatch = (c, i, a, b)
                    break
            elif a != b:
                mismatch = (c, i, a, b)
                break
        if mismatch:
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {q}: value col={c} row={i} want={a!r} got={b!r}")
        fail += 1
    else:
        print(f"OK   {q} rows={len(w)}")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
