#!/usr/bin/env python3
"""Dev harness replicating the driver's correctness gate: for each query
parquet dumped by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf tables and compare (columns sorted by name, rows sorted,
exact value equality; floats reported with max abs diff when not identical).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64 (nullable), floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" !!EMPTY" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
            # DuckDB-side result schema BEFORE pandas degrades it: a bare
            # sum(BIGINT) yields HUGEINT, which fetchdf silently converts to
            # float64 — the exact class the driver's strict hash gate fails
            # on (r2: q_chart, q_window_*, q_tql_pipeline). Fail loudly here.
            desc = con.execute("DESCRIBE " + oracle[name]).fetchdf()
            huge = [f"{r['column_name']}:{r['column_type']}"
                    for _, r in desc.iterrows()
                    if "HUGEINT" in str(r["column_type"]).upper()]
            if huge:
                results[name] = f"ORACLE_HUGEINT {huge} (wrap with CAST(... AS BIGINT))"
                continue
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:120]}"; continue
        # strict tz-awareness compare BEFORE canon erases it: the driver's
        # schema gate fails tz-aware vs naive timestamps (r1: q_timefns).
        def tzmap(df):
            return {c: str(df[c].dtype) for c in df.columns
                    if pd.api.types.is_datetime64_any_dtype(df[c])}
        gt, et = tzmap(got), tzmap(exp)
        if gt != et:
            results[name] = f"SCHEMA_TZ got={gt} exp={et}"; continue
        # numeric-kind strictness BEFORE canon: integer on one side and
        # float on the other means a type was laundered somewhere (pandas
        # degrading HUGEINT, or a genuine Spark/oracle type mismatch) — the
        # driver hashes typed values, so this must FAIL, not fall into the
        # tolerant float branch (r1: tz_localize; r2: HUGEINT — same class).
        kinds = []
        for c in sorted(set(got.columns) & set(exp.columns)):
            gi = pd.api.types.is_integer_dtype(got[c])
            gf = pd.api.types.is_float_dtype(got[c])
            ei = pd.api.types.is_integer_dtype(exp[c])
            ef = pd.api.types.is_float_dtype(exp[c])
            if (gi and ef) or (gf and ei):
                kinds.append(f"{c}: got={got[c].dtype} exp={exp[c].dtype}")
        if kinds:
            results[name] = "DTYPE_KIND " + "; ".join(kinds); continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"COLUMNS got={list(g.columns)} exp={list(e.columns)}"; continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"; continue
        bad = []
        for c in g.columns:
            gc, ec = g[c], e[c]
            if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(ec):
                gv, ev = gc.astype(float).values, ec.astype(float).values
                eq = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
                if not eq.all():
                    d = np.nanmax(np.abs(gv - ev))
                    bad.append(f"{c}: {np.sum(~eq)} diffs maxabs={d:.3e}")
            else:
                eq = (gc.values == ec.values) | (gc.isna().values & ec.isna().values)
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c}: {np.sum(~eq)} diffs first@{i} got={gc.iloc[i]!r} exp={ec.iloc[i]!r}")
        results[name] = "OK rows=%d" % len(g) if not bad else "VALUES " + "; ".join(bad[:3])
    npass = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for name in sorted(results):
        tag = "PASS" if results[name].startswith(("OK", "ROWS_ONLY")) else "FAIL"
        print(f"{tag:4} {name:24} {results[name]}")
    print(f"== {npass}/{len(results)} pass ==")

if __name__ == "__main__":
    main()
