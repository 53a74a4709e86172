#!/usr/bin/env python3
"""Partition-independence comparer: asserts two Verify dumps (produced at
different parallelism, e.g. local[2] vs local[8]) are value-identical for
every query. Sorts rows by all columns (the dumps are already ordered, but
this keeps the check robust to file-split order) and compares cell reprs.

Usage: python3 tools/sweepdiff.py <dumpA> <dumpB>
"""
import sys, os
import pyarrow.parquet as pq


def load(d):
    tbl = pq.read_table(d)
    cols = sorted(tbl.column_names)
    rows = [tuple(repr(tbl.column(c)[i].as_py()) for c in cols)
            for i in range(tbl.num_rows)]
    rows.sort()
    return cols, rows


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(a)
                   if os.path.isdir(os.path.join(a, n)))
    missing = [n for n in names if not os.path.isdir(os.path.join(b, n))]
    if missing:
        print(f"MISSING in {b}: {missing}")
        sys.exit(1)
    bad = 0
    for n in names:
        ca, ra = load(os.path.join(a, n))
        cb, rb = load(os.path.join(b, n))
        if ca != cb:
            print(f"FAIL {n}: schema {ca} != {cb}")
            bad += 1
        elif ra != rb:
            diff = next(i for i, (x, y) in enumerate(zip(ra, rb)) if x != y) \
                if len(ra) == len(rb) else -1
            print(f"FAIL {n}: rows {len(ra)} vs {len(rb)}, first diff row {diff}")
            if diff >= 0:
                print(f"  a: {ra[diff]}\n  b: {rb[diff]}")
            bad += 1
        else:
            print(f"PASS {n}: {len(ra)} rows identical")
    print(f"\n== sweep: {len(names) - bad} identical, {bad} differ ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
