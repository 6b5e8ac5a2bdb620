#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
given SF, execute each oracle SQL in DuckDB over the same parquet
tables, and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py [sfdir] [outdir] [--no-verify] [only_query ...]
"""
import sys, os, json, subprocess, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    if hasattr(v, 'isoformat'):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v) if v is not None else "\0NULL"

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    sfdir = args[0] if len(args) > 0 else '/root/testdata/sf0.01'
    outdir = args[1] if len(args) > 1 else '/root/repo/tmp_check'
    only = set(args[2:])
    if '--no-verify' not in sys.argv:
        r = subprocess.run(['sbt', '-batch', f'runMain graft.Verify {sfdir} {outdir}'],
                           cwd='/root/repo', capture_output=True, text=True, timeout=3600)
        sys.stdout.write('\n'.join(l for l in r.stdout.splitlines()
                                   if 'error' in l.lower() or '[verify]' in l) + '\n')
        if r.returncode != 0:
            print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f'{outdir}/oracle_sql.json'))

    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f'{outdir}/q*')):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        files = glob.glob(f'{qdir}/*.parquet')
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        sres = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        # DESCRIBE gives DuckDB's real type NAMES (the DBAPI description
        # collapses HUGEINT/BIGINT into one NUMBER code and let the
        # q58/q64/q65 type slips ship in round 4)
        stypes = dict(con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM '{qdir}/*.parquet')").fetchall())
        if name not in oracle:
            print(f"{name}: rows-only ({len(srows)} rows)"); n_rowsonly += 1
            if len(srows) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            dres = con.execute(oracle[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        sc, sr = canon(scols, srows)
        dc, dr = canon(dcols, drows)
        if sc != dc:
            print(f"{name}: SCHEMA MISMATCH spark={sc} duck={dc}"); n_fail += 1; continue
        # driver's hasher is TYPE-sensitive (HUGEINT != BIGINT): compare
        # DuckDB's own type names for both sides, keyed by column name
        dtypes = dict(con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE {oracle[name]})").fetchall())
        if stypes != dtypes:
            diff = {c: (stypes.get(c), dtypes.get(c))
                    for c in set(stypes) | set(dtypes) if stypes.get(c) != dtypes.get(c)}
            print(f"{name}: TYPE MISMATCH {diff}"); n_fail += 1; continue
        if sr == dr:
            print(f"{name}: OK ({len(sr)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"{name}: VALUE MISMATCH spark_rows={len(sr)} duck_rows={len(dr)}")
            sset, dset = set(sr), set(dr)
            for r in list(sset - dset)[:3]: print(f"  spark-only: {r}")
            for r in list(dset - sset)[:3]: print(f"  duck-only : {r}")
            if sset == dset:
                print("  (same set, duplicate multiplicity differs)")
    print(f"\nPASS={n_pass} FAIL={n_fail} ROWSONLY={n_rowsonly}")
    sys.exit(1 if n_fail else 0)

if __name__ == '__main__':
    main()
