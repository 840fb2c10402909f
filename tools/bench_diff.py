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

#: Entries whose TIMED REGION changed in a given round: a delta whose
#: window spans the change round measures the measurement, not the
#: engine (r12 ADVICE), so it is annotated instead of percent-flagged.
#: name -> (change_round, note)
MEASUREMENT_CHANGES = {
    "stream_ann_probe": (
        12,
        "r12 moved the k-means save to warm-up; only the recorded "
        "isolate anchors (r13: 7.583s mid-3) are comparable across it",
    ),
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_of(path: str) -> int | None:
    import re

    m = re.search(r"BENCH_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None


def load(path: str) -> dict:
    """Accept bench.py's raw one-line JSON, a BENCH_DETAIL.json, or
    the driver's BENCH_r*.json wrapper (bench line under 'parsed').
    Since round 7 the stdout line carries no per-query map (it points
    at BENCH_DETAIL.json), so for a wrapper we recover the graded
    per-query timings from the BENCH_DETAIL.json committed by that
    round's driver commit ("round N: ...")."""
    with open(path) as f:
        doc = json.load(f)
    doc = doc.get("parsed", doc)
    rnd = _round_of(path)
    if "queries" not in doc and rnd is not None:
        import subprocess

        try:
            sha = subprocess.run(
                ["git", "-C", REPO, "log", "--format=%H", "-1",
                 "--grep", f"^round {rnd}:"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            if sha:
                blob = subprocess.run(
                    ["git", "-C", REPO, "show", f"{sha}:BENCH_DETAIL.json"],
                    capture_output=True, text=True, check=True,
                ).stdout
                doc["queries"] = json.loads(blob).get("queries", {})
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            pass  # totals-only diff still works
    return doc


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
        ro, rn = _round_of(old_p), _round_of(new_p)
        chg = MEASUREMENT_CHANGES.get(name)
        if chg:
            if ro is not None and rn is not None:
                if ro < chg[0] <= rn:
                    rows.append(
                        (0.0, name, a, b, f"measurement changed ({chg[1]})")
                    )
                    continue
                # both rounds known and on the same side of the change:
                # the delta is a real comparison, no caveat
            else:
                # a raw bench line / BENCH_DETAIL input carries no
                # round — can't prove the window avoids the change, so
                # carry the caveat with the flag instead of silently
                # re-exposing the bogus percent (r12 ADVICE)
                flag += (
                    f"  [timed region changed in r{chg[0]} — "
                    f"ignore unless both sides are r{chg[0]}+]"
                )
        rows.append((abs(pct), name, a, b, flag))
    for _, name, a, b, flag in sorted(rows, reverse=True):
        print(f"  {name:32s} {a if a is not None else '-':>8} -> "
              f"{b if b is not None else '-':>8}  {flag}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # | head
        pass
