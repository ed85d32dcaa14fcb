#!/usr/bin/env python
"""Merge driver CORRECTNESS_r*.json results into verified_queries.json.

The gate window in ``__spark_entry__._ordered()`` rotates queries the
driver has already hash-verified to the back, so each round's 50-slot
window lands on unverified (or newest) surface first. This script keeps
the verified set current: run it at the start of a round, after the
driver drops the previous round's CORRECTNESS file.

Only fully green rows (rows + schema + hash all matching, no error)
count as verified. Names no longer registered in QUERIES are dropped
(a renamed query must re-verify under its new name).

    python scripts/merge_verified.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    from fourmc_spark.queries import QUERIES

    path = os.path.join(HERE, "verified_queries.json")
    try:
        with open(path) as f:
            verified = set(json.load(f)["verified"])
    except (OSError, ValueError, KeyError):
        verified = set()
    before = set(verified)

    for cf in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(cf) as f:
            results = json.load(f)
        for name, r in results.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
                and not r.get("err")
            ):
                verified.add(name)

    dropped = sorted(n for n in verified if n not in QUERIES)
    verified &= set(QUERIES)

    with open(path, "w") as f:
        json.dump({"verified": sorted(verified)}, f, indent=1)
        f.write("\n")
    print(
        f"verified: {len(before)} -> {len(verified)} "
        f"(+{len(verified - before)} new, dropped {dropped or 'none'}); "
        f"unverified: {sorted(set(QUERIES) - verified)}"
    )


if __name__ == "__main__":
    main()
