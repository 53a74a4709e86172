#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (with views named after
the fixture tables), sorts columns by name and rows by all columns, and
compares cell-by-cell. Exact comparison; floats reported with max abs diff
when they mismatch.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Unify decimal.Decimal and float/int logical values for comparison.
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # ORACLE.md pins the authored-against version; print what we ran with
    # so "passes locally, fails on driver" waves are attributable.
    print(f"[check] duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # Fixture contract behind hardcoded oracle enums (q157's pivoted
    # Markov transition columns derive targets from DATA on the Spark
    # side but hardcode click/error/signup/view in the SQL): a
    # regenerated fixture with a new non-purchase event type would
    # silently drop its transition mass from the oracle only. Fail loud.
    if os.path.exists(f"{sf_dir}/events.parquet"):
        et = {r[0] for r in con.execute(
            "SELECT DISTINCT event_type FROM events "
            "WHERE event_type <> 'purchase'").fetchall()}
        if et != {"click", "error", "signup", "view"}:
            print(f"FAIL fixture-contract: non-purchase event types "
                  f"{sorted(et)} != q157's hardcoded enum "
                  "(click/error/signup/view) — update the q157 oracle")
            n_fail += 1
    # q89's full oracle assumes char 4-grams ≡ byte 4-grams (the Spark
    # side slides 4-BYTE grams over UTF-8, the SQL slides 4-CHAR
    # substrings): sound only while documents.text is pure ASCII. One
    # multi-byte char in a regenerated fixture would silently diverge
    # both the gram stream and the length gate — fail loud instead
    # (r9 advice; same class as the q157 enum guard above).
    if os.path.exists(f"{sf_dir}/documents.parquet"):
        non_ascii = con.execute(
            "SELECT COUNT(*) FROM documents "
            "WHERE text IS NOT NULL AND strlen(text) <> length(text)"
        ).fetchone()[0]
        if non_ascii:
            print(f"FAIL fixture-contract: {non_ascii} documents.text rows "
                  "are non-ASCII (byte strlen != char length) — q89's "
                  "char≡byte 4-gram oracle no longer matches PHash128")
            n_fail += 1
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output"); n_skip += 1; continue
        # Decimal-typed OUTPUT columns fail the driver's hash compare even
        # when values are equal (result loaders represent decimals
        # inconsistently) — and this local mirror can NOT reproduce that
        # failure, so guard on the schema instead.
        sch = pq.read_schema(files[0])
        decs = [n for n, t in zip(sch.names, sch.types) if "decimal" in str(t)]
        if decs:
            print(f"FAIL {name}: decimal output columns {decs} "
                  "(driver hash-compare rejects decimal outputs)")
            n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
        cols = [d[0] for d in con.execute(f"SELECT * FROM '{files[0]}' LIMIT 0").description]
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(got)} (no oracle)"); n_skip += 1
            continue
        try:
            cur = con.execute(oracle[name])
            exp = cur.fetchall()
            ecols = [d[0] for d in cur.description]
            # Mirror of the Spark-side decimal guard above, for the ORACLE
            # side: the driver's result loader hashes DuckDB HUGEINT (INT128)
            # and DECIMAL outputs differently from BIGINT/DOUBLE even when
            # values match (judge-confirmed r8: the only 4 HUGEINT-emitting
            # oracles were exactly the 4 driver hash-fails). SUM(int) and
            # SUM(CASE..THEN 1..) return HUGEINT in DuckDB — CAST the
            # oracle's final output columns to BIGINT/DOUBLE.
            etypes = con.execute(
                f"DESCRIBE {oracle[name]}").fetchall()
            bad_t = [(r[0], r[1]) for r in etypes
                     if r[1].upper().startswith(("HUGEINT", "DECIMAL",
                                                 "INT128", "UHUGEINT"))]
            if bad_t:
                print(f"FAIL {name}: oracle output columns {bad_t} are "
                      "HUGEINT/DECIMAL (driver loader hashes INT128/decimal "
                      "differently — CAST to BIGINT/DOUBLE in the oracle SQL)")
                n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(cols) != sorted(ecols):
            print(f"FAIL {name}: columns spark={sorted(cols)} oracle={sorted(ecols)}")
            n_fail += 1; continue
        # reorder columns by sorted name, then sort rows
        gidx = [cols.index(c) for c in sorted(cols)]
        eidx = [ecols.index(c) for c in sorted(ecols)]
        g = sorted([tuple(norm(r[i]) for i in gidx) for r in got], key=str)
        e = sorted([tuple(norm(r[i]) for i in eidx) for r in exp], key=str)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            n_fail += 1; continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            if rg != re_:
                bad = (i, rg, re_); break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only/skipped ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
