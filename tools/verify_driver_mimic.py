#!/usr/bin/env python3
"""Mimic the DRIVER's comparator as closely as we can infer:
load Spark result parquet via pandas, run oracle SQL in DuckDB and fetch
as pandas df, sort columns by name, df.sort_values(by=all columns), then
compare stringified values. Prints dtypes and first diffs per query.
Dev tool only."""
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
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files or name not in oracles:
            continue
        got = pd.read_parquet(files[0])
        want = con.execute(oracles[name]).df()
        gr, ge = canon_df(got)
        wr, we = canon_df(want)
        if ge or we:
            print(f"ERR  {name}: spark={ge} duck={we}")
            continue
        if len(gr) != len(wr):
            print(f"ROWS {name}: {len(gr)} vs {len(wr)}")
            continue
        if gr != wr:
            diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)} diff rows; cols={sorted(got.columns)}")
            print(f"  spark dtypes: {dict(got.dtypes.astype(str))}")
            print(f"  duck  dtypes: {dict(want.dtypes.astype(str))}")
            print(f"  spark[{i}]: {gr[i]}")
            print(f"  duck [{i}]: {wr[i]}")
        else:
            print(f"PASS {name}")


if __name__ == "__main__":
    main()
