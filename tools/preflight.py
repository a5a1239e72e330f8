"""Round-end pre-flight: the three degenerate-corpus sweeps as ONE gate.

Round 9 proved the sweeps find real bugs (13 empty + 3 tiny + 10 NULL-payload
divergences, all fixed), so they are part of "done for the round" exactly like
the oracle sweep — this wrapper exists so the checklist is one command and a
new operator can't land without surviving all three modes
(tests/test_degenerate.py pins one representative per failure CLASS; this
sweeps the CURRENT full registry).

Each mode runs in its own subprocess: a fresh JVM per sweep keeps one mode's
cached state (anchor caches, warehouse dirs, stopped SparkContexts) from
leaking into the next, and matches how the modes are run by hand.

Usage:
    python tools/preflight.py            # empty + tiny + nulls, full registry
    python tools/preflight.py name ...   # subset of queries, all three modes

Exit 0 iff all three sweeps report zero divergences.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
MODES = ("--empty", "--tiny", "--nulls")


def main() -> int:
    extra = sys.argv[1:]
    results: dict[str, dict] = {}
    rc_total = 0
    for mode in MODES:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(HERE, "degenerate_check.py"), mode, *extra],
            capture_output=True,
            text=True,
        )
        tail = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1:]
        results[mode.lstrip("-")] = {
            "rc": proc.returncode,
            "sec": round(time.time() - t0, 1),
            "summary": tail[0] if tail else "(no output)",
        }
        rc_total |= proc.returncode
        print(f"{mode.lstrip('-'):>6}: rc={proc.returncode} "
              f"{results[mode.lstrip('-')]['summary']}", flush=True)
        if proc.returncode != 0:
            # surface the divergent lines, not just the count
            for ln in proc.stdout.splitlines():
                if "DIVERGENT" in ln or "FAIL" in ln:
                    print("   ", ln, flush=True)
    print(json.dumps({"metric": "preflight_degenerate", "ok": rc_total == 0,
                      "modes": results}), flush=True)
    return rc_total


if __name__ == "__main__":
    raise SystemExit(main())
