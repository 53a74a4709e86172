#!/usr/bin/env python3
"""Strict (repr-level) mirror of the driver's hash compare.

Unlike tools/check.py (which normalizes Decimal scale), this compares the
exact type+string representation of every cell, after sorting columns by
name and rows by value — i.e. what a value-hash would see. Reports the
first differing cell per query with full repr so scale/type drift is
visible.

Usage: python3 tools/strictcheck.py <sfDir> <verifyOutDir> [query...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(v):
    # What a str()-based hasher would feed: type-tagged exact repr.
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("Decimal", str(v))
    if isinstance(v, float):
        return ("float", repr(v))
    return (type(v).__name__, str(v))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files or name not in oracle:
            n_skip += 1
            continue
        got = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM '{files[0]}' LIMIT 0").description]
        cur = con.execute(oracle[name])
        exp = cur.fetchall()
        ecols = [d[0] for d in cur.description]
        gidx = [cols.index(c) for c in sorted(cols)]
        eidx = [ecols.index(c) for c in sorted(ecols)]
        g = sorted(tuple(cell(r[i]) for i in gidx) for r in got)
        e = sorted(tuple(cell(r[i]) for i in eidx) for r in exp)
        if g == e:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
            continue
        n_fail += 1
        diffs = 0
        for i, (rg, re_) in enumerate(zip(g, e)):
            if rg != re_:
                for c, (a, b) in zip(sorted(cols), zip(rg, re_)):
                    if a != b:
                        print(f"FAIL {name} row{i} col {c}: spark={a} oracle={b}")
                        diffs += 1
                        break
                if diffs >= 3:
                    break
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} vs {len(e)}")
    print(f"\n== strict: {n_pass} pass, {n_fail} fail, {n_skip} skipped ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
