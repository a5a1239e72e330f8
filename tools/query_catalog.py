"""Generate QUERIES.md — the user-facing catalog of every registered query.

    python tools/query_catalog.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tf_idf_using_mapreduce_spark.registry import ORACLES, QUERIES

    print("# QUERIES — every registered capability\n")
    print("Auto-generated (`python tools/query_catalog.py > QUERIES.md`). Run any")
    print("of these with `tf_idf_using_mapreduce_spark.run(name)`; names marked")
    print("oracle=yes are value-checked against DuckDB every round, the rest are")
    print("rows-only by declared necessity (first docstring line says why).\n")
    print("| query | oracle | module | summary |")
    print("|---|---|---|---|")
    for name, fn in QUERIES.items():
        target = getattr(fn, "__wrapped__", fn)
        mod = getattr(target, "__module__", "?").replace("tf_idf_using_mapreduce_spark.", "")
        doc = (getattr(target, "__doc__", None) or "").strip()
        para = " ".join(line.strip() for line in doc.split("\n\n")[0].splitlines())
        cut = para.find(". ")
        summary = para[: cut + 1] if cut != -1 else para
        if len(summary) > 140:
            summary = summary[:137] + "..."
        summary = summary.replace("|", "\\|")
        print(f"| `{name}` | {'yes' if name in ORACLES else 'rows-only'} | {mod} | {summary} |")
    print(f"\n{len(QUERIES)} queries, {len(ORACLES)} oracled.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
