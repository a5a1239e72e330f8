"""Dump ``explain(formatted)`` + extracted plan facts for the headline queries
— the iterate-until-it's-the-plan-you-want loop. Usage:

    python tools/plan_report.py [sf_dir] [name ...] > PLANS.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_idf_using_mapreduce_spark.plans.explain import analyze
from tf_idf_using_mapreduce_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e

    qs = e.queries()
    names = sys.argv[2:] or list(qs)
    spark = get_spark("plan-report")
    for name in names:
        df = qs[name](spark, sf_dir)
        facts = analyze(df)
        print(f"===== {name} =====")
        print(
            f"broadcast_joins={facts.broadcast_joins} shuffles={facts.shuffle_exchanges} "
            f"sort_merge_joins={facts.sort_merge_joins} python_evals={facts.python_evals} "
            f"take_ordered={facts.take_ordered}"
        )
        print(f"pushed_filters={facts.pushed_filters}")
        print(f"read_schemas={facts.read_schemas}")
        df.explain("formatted")
        print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
