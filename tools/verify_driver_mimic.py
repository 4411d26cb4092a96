#!/usr/bin/env python3
"""Mimic the DRIVER's comparator as closely as we can infer:
load Spark result parquet via pandas (decimal128 -> Python Decimal
objects, i.e. the coercion verify_local.py's arrow path can NOT see),
run oracle SQL in DuckDB and fetch as a pandas df (DuckDB coerces
DECIMAL to float64), sort columns by name, df.sort_values(by=all
columns), then compare stringified values. Prints dtypes and first
diffs per query, a summary line, and exits 1 on any FAIL/ROWS/ERR so
run_verify.sh can use it as a gate (round-9 task: the arrow-based
verify_local.py passed j5 for three rounds while the driver failed it
on exactly this decimal-vs-float stringification class)."""
import sys, os, json, glob
import duckdb
import pandas as pd


def canon_df(df):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        return None, f"sort error: {e}"
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return rows, None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            # a result dir with no parquet is a FAILED/partial write,
            # not an oracle-less query — a gate must not pass it
            print(f"ERR  {name}: result dir has no parquet files")
            n_fail += 1
            continue
        if name not in oracles:
            n_skip += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        want = con.execute(oracles[name]).df()
        gr, ge = canon_df(got)
        wr, we = canon_df(want)
        if ge or we:
            print(f"ERR  {name}: spark={ge} duck={we}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"ROWS {name}: {len(gr)} vs {len(wr)}")
            n_fail += 1
            continue
        if gr != wr:
            diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)} diff rows; cols={sorted(got.columns)}")
            print(f"  spark dtypes: {dict(got.dtypes.astype(str))}")
            print(f"  duck  dtypes: {dict(want.dtypes.astype(str))}")
            print(f"  spark[{i}]: {gr[i]}")
            print(f"  duck [{i}]: {wr[i]}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== mimic: {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
