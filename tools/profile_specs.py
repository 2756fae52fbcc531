"""Profile individual query specs: warm re-execution + plan summary.

Optimization-round instrumentation (guide §1): isolates one or a few
specs, builds the DataFrame once (memos allowed to persist, like the
bench's warm passes), then times N repeated executions through BOTH
the noop sink (computation only, guide §1.4) and ``toArrow()`` (the
bench's fetch), and prints a physical-plan operator census (Exchange
count, join strategies, Python-eval nodes) so before/after claims are
tied to plan shape, not vibes.

Run:  python tools/profile_specs.py <name_rx> [n_reps]
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_OPS = (
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Generate",
    "InMemoryTableScan",
)


def plan_census(df) -> dict[str, int]:
    text = df._jdf.queryExecution().executedPlan().toString()
    return {op: text.count(op) for op in _OPS if text.count(op)}


def main() -> None:
    name_rx = re.compile(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gcp_dbt_data_engineering_spark import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="profile-specs")
    sc = spark.sparkContext
    specs = {
        n: s for n, s in entrymod._all_specs().items() if name_rx.search(n)
    }
    # warm up workers + listing like the bench
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(8).mapInArrow(lambda it: it, "id long").count()

    print(f"{'spec':36s} {'noop_min':>9s} {'arrow_min':>10s}  census")
    for name in sorted(specs):
        spec = specs[name]
        df = spec.spark(spark, sf_dir)  # build pass: memos populate
        df.toArrow()
        noop, arrow = [], []
        for _ in range(reps):
            sc.setJobDescription(f"{name}: noop")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
            sc.setJobDescription(f"{name}: arrow")
            t0 = time.perf_counter()
            df.toArrow()
            arrow.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
        print(
            f"{name:36s} {min(noop):9.3f} {min(arrow):10.3f}  "
            f"{plan_census(df)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
