#!/usr/bin/env python3
"""Merge per-worker oracle_check --json artifacts into a committed
CORRECTNESS_* file. Later inputs win per gate; pass the base file first.

Usage: merge_correctness.py OUT base.json worker1.json [worker2.json ...]
"""
import json, sys

out = sys.argv[1]
merged = {}
for p in sys.argv[2:]:
    with open(p) as f:
        merged.update(json.load(f))
with open(out, "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
green = sum(1 for v in merged.values()
            if v.get("hash_match") and v.get("rows_match")
            and v.get("schema_match"))
print(f"{out}: {green}/{len(merged)} green")
