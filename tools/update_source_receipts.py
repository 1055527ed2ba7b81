#!/usr/bin/env python
"""Refresh SOURCE_RECEIPTS.json from the latest CORRECTNESS round.

SOURCE_RECEIPTS.json maps query name -> source hash (registered function
source + oracle SQL, see registry.query_source_hashes) as of the query's
most recent completed driver check. check_order front-loads any query
whose current hash no longer matches its receipt (VERDICT r9 §4: a
semantics rewrite must not ride a stale green row past the driver's
verification budget).

Run at ROUND START, before any source edits: the working tree then still
equals the code the external driver just verified, so "current module
hash" IS the hash-at-verification for every query the newest round
checked. Entries for queries not in the newest round are left untouched
(they keep the hash from whichever earlier round last verified them).

    python tools/update_source_receipts.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RECEIPTS = os.path.join(ROOT, "SOURCE_RECEIPTS.json")


def main() -> int:
    from streamming_processing_pyspark_spark.registry import (
        query_source_hashes,
    )

    rounds = []
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        print("no CORRECTNESS files; nothing to do")
        return 0
    rnd, latest = max(rounds)
    with open(latest) as f:
        data = json.load(f)

    hashes = query_source_hashes()
    try:
        with open(RECEIPTS) as f:
            receipts = json.load(f)
    except (OSError, ValueError):
        receipts = {}

    updated = 0
    for name, row in data.items():
        if not isinstance(row, dict) or name not in hashes:
            continue
        checks = [v for k, v in row.items() if k.endswith("_match")]
        green = row.get("err") is None and checks and all(checks)
        rows_only = (
            row.get("err") == "no_oracle"
            and row.get("spark_rows") is not None
        )
        if not (green or rows_only):
            continue
        receipts[name] = hashes[name]
        updated += 1

    with open(RECEIPTS, "w") as f:
        json.dump(dict(sorted(receipts.items())), f, indent=1)
        f.write("\n")
    print(f"round {rnd}: refreshed {updated} receipts -> {RECEIPTS}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
