#!/usr/bin/env python3
"""Determinism proof: compare two independent graft.Verify dumps.

Usage: python3 tools/determinism.py <dirA> <dirB>

For every query directory present in dirA, loads both parquet results,
sorts columns by name and rows by all columns (the driver's hashing
normalization), and reports whether the contents are identical. Exits
non-zero on any mismatch or any query missing from dirB.
"""
import sys

import pandas as pd
from pathlib import Path


def canon(path: Path) -> pd.DataFrame:
    df = pd.read_parquet(path)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    queries = sorted(p.name for p in a.iterdir()
                     if p.is_dir() and p.name.startswith("q"))
    bad = 0
    for q in queries:
        if not (b / q).is_dir():
            print(f"MISS {q}: absent from {b}")
            bad += 1
            continue
        da, db = canon(a / q), canon(b / q)
        if da.equals(db):
            print(f"OK   {q} ({len(da)} rows)")
        else:
            print(f"DIFF {q}")
            bad += 1
    print(f"\n{len(queries) - bad}/{len(queries)} queries content-identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
