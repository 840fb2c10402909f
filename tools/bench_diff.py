#!/usr/bin/env python
"""Diff two bench JSON lines (BENCH_r*.json or bench.py output).

Usage:
    python tools/bench_diff.py OLD.json NEW.json
    python tools/bench_diff.py            # newest two BENCH_r*.json

Prints per-query delta sorted by relative change.  The bench host has
heavy CPU-steal variance (PROJECT memory: only chase regressions that
reproduce), so deltas under NOISE_PCT are collapsed to '~'.
"""

from __future__ import annotations

import glob
import json
import os
import sys

NOISE_PCT = 30.0

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r*.json wrapper (bench line under 'parsed')."""
    with open(path) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def main() -> None:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        hist = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if len(hist) < 2:
            raise SystemExit("need two BENCH_r*.json files or two args")
        old_p, new_p = hist[-2], hist[-1]
    old, new = load(old_p), load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"old: {old_p}  total={old.get('value')}s")
    print(f"new: {new_p}  total={new.get('value')}s")
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        pct = (b - a) / a * 100 if a else 0.0
        flag = "~" if abs(pct) < NOISE_PCT else (f"{pct:+.0f}%")
        rows.append((abs(pct), name, a, b, flag))
    for _, name, a, b, flag in sorted(rows, reverse=True):
        print(f"  {name:32s} {a if a is not None else '-':>8} -> "
              f"{b if b is not None else '-':>8}  {flag}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # | head
        pass
