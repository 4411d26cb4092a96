#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

For each query result parquet under OUTDIR, run the matching oracle SQL
(from OUTDIR/oracle_sql.json) in DuckDB over the testdata tables of
SFDIR, then compare: schema (column names sorted), row count, and a
value hash computed on columns sorted by name. Prints one line per
query. Dev tool only — the shipped Scala library has no Python deps.
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq


def canon(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # shortest repr; ints print as 1.0
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(x) for x in row) for row in zip(*data)] if data else (cols, [])


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        if name not in oracles:
            ok = got.num_rows > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows={got.num_rows} (no oracle)")
            n_rowsonly += ok
            n_fail += (not ok)
            continue
        try:
            want = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        gc, gr = table_rows(got)
        wc, wr = table_rows(want)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} != {wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        if gr != wr:
            diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)} differing rows; first at {i}:")
            print(f"   spark : {gr[i]}")
            print(f"   duckdb: {wr[i]}")
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(gr)}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail "
          f"/ {len(names)} queries ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
