"""Monotone-scaling evidence (BASELINE.md obligation): run the bench suite at
sf0.001 / 0.01 / 0.1 and emit a markdown table → SCALING_r{N}.md.

    python tools/scaling_report.py > SCALING_r1.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["0.001", "0.01", "0.1"]


def main() -> int:
    results = {}
    for sf in SFS:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        # bench.py prints TWO JSON lines (full result, then a short
        # tail-window summary without the per-query map) — take the last
        # line that actually carries the "queries" map.
        parsed = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
        results[sf] = [p for p in parsed if "queries" in p][-1]

    queries = list(results[SFS[0]]["queries"])
    print("# SCALING — bench suite across scale factors\n")
    print("Wall-clock seconds per query (local[32]; lineitem rows 6k/60k/600k,")
    print("documents 500/500/5000). Fixed per-query Spark overhead (~0.2-1 s of")
    print("job scheduling + codegen) dominates at small SF; the signal is that")
    print("nothing scales worse than the data growth.\n")
    print("| query | " + " | ".join(f"sf{sf}" for sf in SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for q in queries:
        cells = " | ".join(f"{results[sf]['queries'][q]:.2f}" for sf in SFS)
        print(f"| {q} | {cells} |")
    total = " | ".join(f"{results[sf]['value']:.2f}" for sf in SFS)
    print(f"| **total** | {total} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
