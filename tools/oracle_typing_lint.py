#!/usr/bin/env python3
"""Oracle result-typing lint (round-6 item 2, VERDICT r5).

DuckDB promotes sum() over BIGINT to HUGEINT, so an uncast `sum(x) // n`
oracle column fetches into pandas as float64 and renders as `66.0` while
Spark's BIGINT renders `66` — the driver's value-hash splits on typing
alone (bit q83_vocab_oov and q102_skew_report in round 5). This lint
binds EVERY oracle SQL as a DuckDB relation against a small SF dir and
fails if any result column's logical type is HUGEINT/UHUGEINT (the
int128 promotions pandas can't hold losslessly).

Usage: python3 tools/oracle_typing_lint.py <sfDir> <oracle_sql.json>
Exit 0 = clean; exit 1 = violations listed, one line each.
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BANNED = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


def main(sf, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    bad = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            for cname, ctype in zip(rel.columns, rel.types):
                if str(ctype).upper() in BANNED:
                    bad.append((name, cname, str(ctype)))
        except Exception as e:
            bad.append((name, "<exec>", f"ERROR {str(e)[:160]}"))
    if bad:
        for name, col, dt in bad:
            print(f"BAD TYPE {name}.{col}: {dt}")
        print(f"{len(bad)} violations")
        return 1
    print(f"OK: {len(oracle)} oracle queries, no HUGEINT result columns")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
