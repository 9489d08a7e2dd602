#!/usr/bin/env python3
"""Compare two graft.Verify output trees (parquet per query) value-for-value.

Usage: diff_verify.py BASE_DIR NEW_DIR
Exit 0 when every query's rows match exactly (after canonical sort), 1 otherwise.
"""
import sys, os, glob
import pyarrow.parquet as pq
import pandas as pd

base, new = sys.argv[1], sys.argv[2]
bad = 0
names = sorted(d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d)))
for name in names:
    bdir, ndir = os.path.join(base, name), os.path.join(new, name)
    if not os.path.isdir(ndir):
        print(f"MISSING {name}"); bad += 1; continue
    def load(d):
        fs = sorted(glob.glob(os.path.join(d, "*.parquet")))
        t = pd.concat([pq.read_table(f).to_pandas() for f in fs], ignore_index=True)
        return t.sort_values(by=list(t.columns), kind="mergesort").reset_index(drop=True)
    try:
        bt, nt = load(bdir), load(ndir)
    except Exception as e:
        print(f"ERR {name}: {e}"); bad += 1; continue
    if list(bt.columns) != list(nt.columns):
        print(f"SCHEMA {name}: {list(bt.columns)} vs {list(nt.columns)}"); bad += 1; continue
    if len(bt) != len(nt):
        print(f"ROWS {name}: {len(bt)} vs {len(nt)}"); bad += 1; continue
    eq = bt.equals(nt)
    if not eq:
        # find first differing cell for the report
        diffs = (bt != nt) & ~(bt.isna() & nt.isna())
        loc = diffs.any(axis=1)
        i = loc.idxmax()
        print(f"VALUES {name}: first diff row {i}:\n  base {bt.loc[i].to_dict()}\n  new  {nt.loc[i].to_dict()}")
        bad += 1
    else:
        print(f"ok {name} ({len(bt)} rows)")
print("PASS" if bad == 0 else f"FAIL ({bad})")
sys.exit(0 if bad == 0 else 1)
