"""Print the SCALE.md measured-curve markdown table from
SCALE_BENCH.json (run after tools/scale_bench.py refreshes it)."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    data = json.load(open(os.path.join(REPO, "SCALE_BENCH.json")))
    print("| Operator | x1 | x10 | x100 | t(x100)/t(x1) | quadratic would be |")
    print("|---|---|---|---|---|---|")
    for name, r in data["operators"].items():
        s = r["sec"]
        print(
            f"| {name} | {s['x1']:.1f} s | {s['x10']:.1f} s | {s['x100']:.1f} s "
            f"| **{r['t100_over_t1']:.0f}x** | 10,000x |"
        )


if __name__ == "__main__":
    main()
