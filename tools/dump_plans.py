"""Dump ``explain("formatted")`` for every ``queries()`` spec to files.

Optimization-round evidence (guide §1): the judge cannot run Spark, so
the claimed plan shapes (Exchange counts, join strategies, pushed
filters, Python-eval nodes) are committed as text artifacts.

Run:  python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [name_rx]

Writes ``<out_dir>/<spec>_<suffix>.txt`` per spec. Materialization
specs run full rebuild pipelines (their builders execute writes), so
only the final returned DataFrame's plan is dumped — the per-batch
write plans are not a single explainable tree.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    name_rx = re.compile(sys.argv[4]) if len(sys.argv) > 4 else None
    os.makedirs(out_dir, exist_ok=True)

    from gcp_dbt_data_engineering_spark import get_spark

    import __spark_entry__ as entrymod
    from tools.plan_audit import _formatted

    spark = get_spark(app_name="dump-plans")
    specs = entrymod._all_specs()
    for name, spec in sorted(specs.items()):
        if name_rx is not None and not name_rx.search(name):
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = spec.spark(spark, sf_dir)
            text = _formatted(df)
        except Exception as exc:  # record, keep dumping the rest
            text = f"ERROR building plan: {exc!r}\n"
        with open(path, "w") as f:
            f.write(text)
        print(name, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
