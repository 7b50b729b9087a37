#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each SparkEntry result parquet and its oracle SQL (both via DuckDB,
like the driver), sorts columns by name and rows by all columns, and
compares values exactly. Prints one line per query: OK / MISMATCH / ERROR.

Queries with no dumped result dir are counted as skipped; that fails the
exit code UNLESS SPARK_GRAFT_ONLY is set in the environment (export it —
not just as an sbt prefix — when checking a filtered Verify run), so a
full run can never silently lose a crashed query.
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = f"{out}/{name}/*.parquet"
        # filtered runs (SPARK_GRAFT_ONLY=...) dump a subset — skip the
        # rest, but COUNT them: a full run must not lose a crashed query
        # (a query that throws in Verify never creates its dir, and a
        # silent skip would record an all-green round with it missing)
        if not os.path.isdir(f"{out}/{name}"):
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_glob}')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"MISMATCH {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"MISMATCH {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        # exact value compare; nulls (None/NaN) compare equal to each other
        diff_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.astype(object) == b.astype(object))
                both_null = a.isna() & b.isna()
                if not bool((eq | both_null).all()):
                    diff_cols.append(c)
            except Exception:
                diff_cols.append(c)
        if diff_cols:
            print(f"MISMATCH {name}: cols {diff_cols}")
            for c in diff_cols[:2]:
                mask = ~(g[c].astype(object).where(g[c].notna(), None)
                         == w[c].astype(object).where(w[c].notna(), None))
                print(f"  {c}: got={g[c][mask].head(3).tolist()} "
                      f"want={w[c][mask].head(3).tolist()}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            n_ok += 1
    # rows-only queries (declared without oracle)
    for d in sorted(os.listdir(out)):
        if os.path.isdir(f"{out}/{d}") and d not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out}/{d}/*.parquet')").fetchone()[0]
            print(f"ROWSONLY {d}: {n} rows")
    print(f"-- {n_ok} ok, {n_bad} bad, {n_skip} skipped (not dumped) --")
    # a skip is only legitimate under SPARK_GRAFT_ONLY filtering; a full
    # Verify run that lost queries must fail the check
    filtered = bool(os.environ.get("SPARK_GRAFT_ONLY"))
    return 1 if n_bad or (n_skip and not filtered) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
