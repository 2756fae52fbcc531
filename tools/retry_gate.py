"""Task-retry determinism gate → RETRY_GATE.json.

A 1000-executor cluster loses tasks constantly (spot preemption, OOM
kills, disk faults); Spark re-runs them, and the ENGINE's outputs must
be bit-identical under those retries. Single-JVM `local[N]` never
retries, so none of the existing gates exercise this path.

Mechanism: the session runs under ``local[8,3]`` (maxFailures=3) and
every ``load_table`` result is wrapped in a pass-through
``mapInPandas`` whose FIRST attempt on partition 0 raises — so every
job that scans a base table pays at least one genuine task retry (the
retried attempt passes rows through untouched). Representative specs
from each operator family then run end-to-end and their canonical
output must EXACTLY match the DuckDB oracle on the same parquet —
the same rows+schema+hash bar as the correctness gate.

What this catches: retry-order-dependent accumulators, per-attempt
RNG/time dependence, non-idempotent Arrow kernels, partial-aggregate
state leaking across attempts. All engine arithmetic is deterministic
hashes + fixed-order folds, so the expected answer is: identical.

Run:  python tools/retry_gate.py [sf_dir] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# must be set before the session module builds the SparkSession
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[8,3]")

#: one spec per operator family: scans+joins, global agg, window,
#: hash-threshold sampling, shingle dedup, LSH, quantized similarity,
#: Arrow mapInPandas kernel, sketch partials, per-day series.
SPECS = [
    "revenue_by_region",
    "pricing_summary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "multimodal_byte_features",
    "text_token_stats",
    "sketch_hll_distinct_users",
    "stats_bootstrap_ci",
    "events_sessionize",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "__NaN__"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sha(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _install_failing_scan_wrapper() -> str:
    """Wrap sources.load_table so every scan's partition 0 fails its
    first attempt. Patched on the registry AND on every module that
    imported the symbol directly. Returns the marker-file path whose
    line count proves failures actually fired — zero at the end means
    the gate was vacuous and it fails."""
    import importlib
    import pkgutil

    import gcp_dbt_data_engineering_spark as pkg
    from gcp_dbt_data_engineering_spark.sources import registry

    real = registry.load_table
    # Spark DROPS accumulator updates from failed tasks, so the proof
    # that failures actually fired is a marker file appended by the
    # executor right before raising (valid here: local-mode executors
    # share the driver's filesystem).
    marker = os.path.join(
        "/tmp", f"retry_gate_markers_{os.getpid()}.log"
    )

    def flaky_load_table(spark, sf_dir, name):
        df = real(spark, sf_dir, name)
        schema = df.schema

        def passthrough(batches):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            if ctx is not None and ctx.partitionId() == 0 and (
                ctx.attemptNumber() == 0
            ):
                with open(marker, "a") as f:
                    f.write("injected\n")
                raise RuntimeError(
                    "retry-gate: injected first-attempt failure"
                )
            yield from batches

        return df.mapInPandas(passthrough, schema=schema)

    patched = []
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mod = importlib.import_module(m.name)
        if getattr(mod, "load_table", None) is real:
            mod.load_table = flaky_load_table
            patched.append(m.name)
    registry.load_table = flaky_load_table
    print(f"patched load_table in {len(patched)} modules")
    return marker


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "RETRY_GATE.json"
    )

    import duckdb

    import __spark_entry__ as entry
    from gcp_dbt_data_engineering_spark import get_spark

    spark = get_spark(app_name="retry_gate")
    assert "local[8,3]" in spark.sparkContext.master
    marker = _install_failing_scan_wrapper()

    con = duckdb.connect()
    from gcp_dbt_data_engineering_spark.sources import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    results: dict[str, dict] = {}
    n_fail = 0
    for name in SPECS:
        try:
            df = qs[name](spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_sha = _sha(df.columns, s_rows)
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            o_sha = _sha(o_cols, o_rows)
            ok = s_sha == o_sha and len(s_rows) == len(o_rows)
            results[name] = {
                "pass": ok,
                "spark_rows": len(s_rows),
                "oracle_rows": len(o_rows),
                "spark_sha": s_sha,
                "oracle_sha": o_sha,
            }
        except Exception as exc:  # noqa: BLE001
            results[name] = {"pass": False, "err": str(exc)[:400]}
        if not results[name]["pass"]:
            n_fail += 1
        print(
            ("PASS " if results[name]["pass"] else "FAIL ") + name,
            flush=True,
        )

    n_injected = 0
    if os.path.exists(marker):
        with open(marker) as f:
            n_injected = sum(1 for _ in f)
        os.remove(marker)
    if n_injected == 0:
        n_fail += 1  # vacuous run: no failure ever fired
    payload = {
        "master": spark.sparkContext.master,
        "sf_dir": sf_dir,
        "n_specs": len(SPECS),
        "n_fail": n_fail,
        "n_injected_failures": n_injected,
        "methodology": (
            "every load_table wrapped in a pass-through mapInPandas "
            "whose first attempt on partition 0 raises; session runs "
            "local[8,3] so Spark retries the task; spec output must "
            "hash-match the DuckDB oracle exactly"
        ),
        "specs": results,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"n_fail": n_fail, "out": out}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
