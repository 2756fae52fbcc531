"""Round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line ending with the contract keys {"metric", "value", "unit",
"sf"} plus audit totals; the full per-query Spark AND DuckDB table is
also written to BENCH_detail.json at the repo root (the driver's BENCH
artifact keeps only a tail of stdout, so the committed file is the
auditable record — VERDICT r2 item 3).

Methodology:
- each query is timed as plan-build + execution + collect on a warm
  session (one trivial action first so JVM/codegen startup isn't
  billed to the first query); min over BENCH_PASSES full passes (not
  consecutive reruns: this sandbox shows rare 30-70 s whole-JVM freeze
  episodes; runs a full pass apart don't share an episode).
- the DuckDB oracle of every SQL-expressible spec is timed the same
  way (min over 2 passes) unless BENCH_DUCKDB=0.
- specs are split by QuerySpec.kind: "materialization" specs rebuild
  warehouse tables in multi-batch parquet writes + swaps, so their
  wall-clock is a pipeline/write benchmark — comparing it to the
  oracle's one-shot SELECT is an apples-to-oranges 100x; the JSON
  reports the two sections separately and the headline ratio covers
  the read-only query section.
- the local-mode scheduling floor (driver job submit + stage
  round-trips + collect hop, paid per query, amortized to noise on a
  real cluster) is estimated as the median wall-clock of a trivial
  1-row spark.sql round-trip and reported as floor_per_query_s.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from gcp_dbt_data_engineering_spark import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    specs = entrymod._all_specs()

    # warmup: touch the fact table so file listing + codegen paths are hot
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    passes = int(os.environ.get("BENCH_PASSES", "3"))
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(passes):
        for name in sorted(specs):
            t0 = time.perf_counter()
            df = specs[name].spark(spark, sf_dir)
            counts[name] = len(df.collect())
            dt = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, dt), dt), 4)

    # per-query plan cost: build the DataFrame and force analysis +
    # optimization + physical planning WITHOUT executing (min of 2).
    # This is real driver CPU, but it is per-PLAN, not per-byte: at
    # cluster scale one plan serves a multi-TB query, while DuckDB
    # in-process re-plans too (its planner is just microseconds). The
    # detail file reports it so the ratio can be read with and without.
    plan_s: dict[str, float] = {}
    for _ in range(2):
        for name in sorted(specs):
            if specs[name].kind == "materialization":
                continue  # their builder RUNS the rebuild pipeline
            t0 = time.perf_counter()
            df = specs[name].spark(spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            dt = time.perf_counter() - t0
            plan_s[name] = round(min(plan_s.get(name, dt), dt), 4)

    # scheduling-floor estimate: a query that does no work still pays
    # plan analysis + job submit + collect (the local-mode constant)
    floor_samples = []
    for _ in range(15):
        t0 = time.perf_counter()
        spark.sql("SELECT 1 AS x").collect()
        floor_samples.append(time.perf_counter() - t0)
    floor = round(statistics.median(floor_samples), 4)

    duck: dict[str, float] = {}
    if os.environ.get("BENCH_DUCKDB", "1") != "0":
        import duckdb

        from gcp_dbt_data_engineering_spark.sources import TABLES, table_path

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(sf_dir, t)}')"
            )
        for _ in range(2):
            for name, spec in sorted(specs.items()):
                if spec.oracle is None:
                    continue
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                dt = time.perf_counter() - t0
                duck[name] = round(min(duck.get(name, dt), dt), 4)

    mat = {n for n, s in specs.items() if s.kind == "materialization"}
    q_total = round(sum(v for n, v in timings.items() if n not in mat), 4)
    m_total = round(sum(v for n, v in timings.items() if n in mat), 4)
    dq_total = round(sum(v for n, v in duck.items() if n not in mat), 4)
    dm_total = round(sum(v for n, v in duck.items() if n in mat), 4)
    total = round(q_total + m_total, 4)

    detail = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "passes": passes,
        "floor_per_query_s": floor,
        "sections": {
            "queries": {
                "n": len(timings) - len(mat & set(timings)),
                "spark_s": q_total,
                "duckdb_s": dq_total,
                "ratio": round(q_total / dq_total, 2) if dq_total else None,
                "plan_s": round(
                    sum(v for n, v in plan_s.items() if n not in mat), 4
                ),
                "ratio_execution_only": (
                    round(
                        max(
                            q_total
                            - sum(
                                v
                                for n, v in plan_s.items()
                                if n not in mat
                            ),
                            0,
                        )
                        / dq_total,
                        2,
                    )
                    if dq_total
                    else None
                ),
            },
            "materializations": {
                "n": len(mat & set(timings)),
                "spark_s": m_total,
                "duckdb_equiv_select_s": dm_total,
                "note": "multi-batch rebuild pipelines (parquet writes + "
                "swaps) timed against one-shot SELECT oracles; "
                "write benchmarks, not query benchmarks",
            },
        },
        "per_query": {
            name: {
                "spark_s": timings[name],
                "plan_s": plan_s.get(name),
                "duckdb_s": duck.get(name),
                "ratio": (
                    round(timings[name] / duck[name], 2)
                    if duck.get(name)
                    else None
                ),
                "rows": counts[name],
                "kind": specs[name].kind,
            }
            for name in sorted(timings)
        },
    }
    with open(os.path.join(REPO, "BENCH_detail.json"), "w") as f:
        json.dump(detail, f, indent=1)

    for name in sorted(timings):
        d = duck.get(name)
        print(
            f"# {name}: spark {timings[name]:.3f}s"
            + (f" duckdb {d:.3f}s ratio {timings[name] / d:.1f}x" if d else "")
            + f" ({counts[name]} rows)",
            file=sys.stderr,
        )

    # ONE JSON line; summary keys LAST so they survive tail-truncation
    # of the driver's BENCH artifact
    print(
        json.dumps(
            {
                "queries": timings,
                "queries_duckdb": duck,
                "floor_per_query_s": floor,
                "spark_queries_s": q_total,
                "duckdb_queries_s": dq_total,
                "ratio_queries": (
                    round(q_total / dq_total, 2) if dq_total else None
                ),
                "spark_materializations_s": m_total,
                "n_materializations": len(mat & set(timings)),
                "detail_file": "BENCH_detail.json",
                "metric": f"wall_clock_{len(timings)}_queries",
                "value": total,
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
