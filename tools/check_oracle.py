#!/usr/bin/env python3
"""Local pre-check of the DuckDB oracle (mirrors the driver's t2 compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query...]

For each query with oracle SQL: registers the sfDir parquet tables as DuckDB
views, runs the oracle, loads the Spark result parquet, canonicalizes both
(sort columns by name, sort rows, round doubles), and diffs.
Not part of the Scala engine — iteration tooling only.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("f", round(float(v), 9)) if abs(v) < 2**52 else ("i", v)
        if v is None:
            return ("z",)
        return ("s", str(v))

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql)
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        if sorted(g_cols) != sorted(w_cols):
            print(f"FAIL {name}: columns spark={sorted(g_cols)} "
                  f"duck={sorted(w_cols)}")
            n_bad += 1
            continue
        _, g = canon(g_rows, g_cols)
        _, w = canon(w_rows, w_cols)
        if g == w:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}")
            gs, ws = set(g), set(w)
            for r in list(gs - ws)[:3]:
                print(f"   spark-only: {r}")
            for r in list(ws - gs)[:3]:
                print(f"   duck-only:  {r}")
    print(f"== {n_ok} ok, {n_bad} fail")


if __name__ == "__main__":
    main()
