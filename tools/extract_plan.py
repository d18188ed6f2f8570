#!/usr/bin/env python3
"""Extract one key's section from EXPLAIN.md into a plan artifact file.

usage: extract_plan.py EXPLAIN.md key outfile
"""
import sys, re

src, key, out = sys.argv[1], sys.argv[2], sys.argv[3]
text = open(src).read()
m = re.search(rf"^## {re.escape(key)}\n(.*?)(?=^## |\Z)", text, re.M | re.S)
if not m:
    sys.exit(f"key {key} not found in {src}")
open(out, "w").write(f"## {key}\n" + m.group(1).rstrip() + "\n")
print(f"wrote {out}")
