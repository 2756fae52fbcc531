"""Profile the materialization specs: wall-clock + Spark job count.

Optimization-round instrumentation (guide §1): the materialization
section is ~58% of the bench headline, and its cost model is jobs ×
(local scheduling floor + write/commit overhead), not bytes. This tool
isolates each spec, counts the Spark jobs one invocation launches
(via the status tracker), and times 3 warm repeats, so the per-spec
"how many actions does one rebuild pay for" number is measured, not
guessed.

Run:  python tools/profile_mats.py [name_rx]
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    name_rx = re.compile(sys.argv[1]) if len(sys.argv) > 1 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gcp_dbt_data_engineering_spark import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="profile-mats")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    specs = {
        n: s
        for n, s in entrymod._all_specs().items()
        if s.kind == "materialization" or getattr(s, "eager", False)
    }
    if name_rx is not None:
        specs = {n: s for n, s in specs.items() if name_rx.search(n)}

    # warm up workers + listing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    print(f"{'spec':36s} {'jobs':>5s} {'best_s':>8s} {'runs_s'}")
    for name in sorted(specs):
        times = []
        jobs = 0
        for i in range(3):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids0 = set(sc.statusTracker().getActiveJobsIds() or [])
            before = _job_count(sc)
            t0 = time.perf_counter()
            df = specs[name].spark(spark, sf_dir)
            n = df.toArrow().num_rows
            dt = time.perf_counter() - t0
            after = _job_count(sc)
            times.append(round(dt, 3))
            jobs = after - before
        print(
            f"{name:36s} {jobs:5d} {min(times):8.3f} {times} rows={n}"
        )
    spark.stop()


def _job_count(sc) -> int:
    """Total jobs submitted so far (monotonic counter via next job id)."""
    # AppStatusStore: use the Java status tracker's job ids
    ids = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return max(list(ids) + [-1]) + 1


if __name__ == "__main__":
    main()
