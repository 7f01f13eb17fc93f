#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the parquet tables and compare (schema, row count, values)
with the Spark results dumped by `graft.Verify`.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for cross-engine compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        # decimals arrive as object -> str above; floats stay float
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def repr_mismatch(files, exp: pd.DataFrame):
    """Strict representation check emulating the driver's hash: the Spark dump
    is read via pyarrow/pandas (decimals -> Decimal objects with trailing
    zeros, dates -> datetime.date) while the oracle comes from duckdb .df()
    (decimals -> float64, dates -> Timestamp). Every cell is str()-rendered,
    columns sorted by name, rows sorted, then compared. A query whose VALUES
    match can still fail here — e.g. Decimal('570.60') vs float 570.6 — and
    that is exactly what the driver's hash_match measures."""
    got = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)],
                    ignore_index=True)
    def render(df):
        df = df.reindex(sorted(df.columns), axis=1)
        out = df.astype(object).where(df.notna(), None)
        for c in out.columns:
            out[c] = out[c].map(lambda v: None if v is None else str(v))
        if len(out):
            out = out.sort_values(by=list(out.columns), kind="mergesort",
                                  na_position="last").reset_index(drop=True)
        return out
    g, e = render(got), render(exp)
    if list(g.columns) != list(e.columns) or len(g) != len(e):
        return ["shape"]
    bad = []
    for c in g.columns:
        if not g[c].equals(e[c]):
            m = ~((g[c].isna() & e[c].isna()) | (g[c] == e[c]))
            i = m[m].index[0]
            bad.append(f"{c} (e.g. spark={g[c][i]!r} duck={e[c][i]!r})")
    return bad

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = n_rows_only = 0
    # discover all dumped queries (dirs with parquet inside)
    dumped = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
    for name in sorted(dumped):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "EMPTY-DUMP"; n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(got)} rows)"
            n_rows_only += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"; n_fail += 1; continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            n_fail += 1; continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} duck={len(e)}"
            n_fail += 1; continue
        diff_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            if a.dtype.kind in "fiu" and b.dtype.kind in "fiu":
                # value compare, dtype-insensitive (int32 vs int64 etc.)
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                ok = a.equals(b)
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            results[name] = f"VALUE-MISMATCH cols={diff_cols}"
            n_fail += 1
            # show first differing rows for the first bad column
            c = diff_cols[0]
            mask = ~(((g[c].isna()) & (e[c].isna())) | (g[c] == e[c]))
            idx = mask[mask].index[:3]
            for i in idx:
                print(f"    [{name}] row {i} col {c}: spark={g[c][i]!r} duck={e[c][i]!r}")
        else:
            strict = repr_mismatch(files, exp)
            if strict:
                results[name] = f"REPR-MISMATCH cols={strict}"
                n_fail += 1
            else:
                results[name] = f"PASS ({len(g)} rows)"
                n_pass += 1
    for k, v in sorted(results.items()):
        flag = "  OK " if v.startswith("PASS") else ("  ~  " if v.startswith("ROWS-ONLY") else "  FAIL ")
        print(f"{flag}{k}: {v}")
    missing = set(oracle) - dumped
    for m in sorted(missing):
        print(f"  FAIL {m}: DECLARED-BUT-NOT-DUMPED")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
