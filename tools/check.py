#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
# queries without oracle SQL get the driver's weaker rows-only check
for extra in sorted(set(os.listdir(outdir)) - set(oracle) - {"oracle_sql.json"}):
    rows = con.sql(f"SELECT count(*) FROM '{outdir}/{extra}/*.parquet'").fetchone()[0]
    print(f"ROWS {extra}: {rows} rows (no oracle; rows-only check)")
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_files[0]}'").fetchall()
        got_cols = [d[0] for d in con.sql(
            f"SELECT * FROM '{spark_files[0]}' LIMIT 0").description]
        exp_rel = con.sql(sql)
        exp = exp_rel.fetchall()
        exp_cols = [d[0] for d in exp_rel.description]
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    # Gate-type contract (round-6 forensics): the driver's comparator is
    # only stable on BIGINT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP — a
    # HUGEINT or DECIMAL final column on EITHER side hash-mismatches on
    # the driver even when values are equal (and passes here, where
    # str() collapses the types). Fail loudly so it never ships.
    otypes = [str(t) for t in exp_rel.types]
    stypes = [str(t) for t in con.sql(
        f"SELECT * FROM '{spark_files[0]}' LIMIT 0").types]
    wide = [f"{c}:{t}" for c, t in list(zip(exp_cols, otypes)) +
            list(zip(got_cols, stypes))
            if "HUGEINT" in t or "DECIMAL" in t]
    if wide:
        print(f"FAIL {name}: wide-typed gate columns (driver-unstable): "
              f"{sorted(set(wide))}")
        fail += 1; continue
    # driver sorts columns by name before hashing values
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
        fail += 1; continue
    g = sorted(tuple(str(r[i]) for i in gi) for r in got)
    e = sorted(tuple(str(r[i]) for i in ei) for r in exp)
    if g == e:
        print(f"OK   {name} ({len(g)} rows)"); ok += 1
    else:
        print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
        for a, b in list(zip(g, e))[:200]:
            if a != b:
                print(f"  spark: {a}\n  duck : {b}"); break
        onlyg = [r for r in g[:5000] if r not in set(e)][:3]
        onlye = [r for r in e[:5000] if r not in set(g)][:3]
        if onlyg: print(f"  only-spark: {onlyg}")
        if onlye: print(f"  only-duck : {onlye}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
