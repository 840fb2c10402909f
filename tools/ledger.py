#!/usr/bin/env python
"""Driver-evidence ledger: for every registered query, the most recent
CORRECTNESS_r*.json round it appeared in and whether that appearance
was green.  The round rotation rule (_DRIVER_PRIORITY in queries.py)
is computed from this: the oldest-evidence block leads the next
round's 50-row driver sample.

Usage: python tools/ledger.py   (run from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ledger() -> dict[str, tuple[int, bool]]:
    out: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            )
            out[name] = (rnd, ok)
    return out


def main() -> None:
    led = ledger()
    by_round = Counter(rnd for rnd, _ok in led.values())
    print(f"queries with driver evidence: {len(led)}")
    for rnd in sorted(by_round):
        print(f"  r{rnd}: {by_round[rnd]}")
    fails = sorted(n for n, (_r, ok) in led.items() if not ok)
    print(f"latest-appearance failures: {fails or 'none'}")
    oldest = min(by_round)
    block = sorted(n for n, (r, _ok) in led.items() if r == oldest)
    print(f"\noldest block (r{oldest}, {len(block)} names — next rotation head):")
    for n in block:
        print(f"  {n}")


if __name__ == "__main__":
    main()
