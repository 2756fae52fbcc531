"""Console entry points matching the reference's job-submission shapes.

The reference submits two PySpark job kinds to Dataproc Serverless from
its Composer DAG (``tests/orchestrate.md:278-301``): a DQ checker
invoked as ``dq_checker.py --config <json> --fecha {{ ds }}
--execution_date {{ ts }}``, and a profiling job whose config carries
``tables`` / ``fecha`` / ``run_id`` / ``environment`` / ``output_table``
(``tests/profiling_example.py:1-33``). These CLIs are the
``spark-submit``-able equivalents over the parquet lake: same argument
surface, same config schema, results to a parquet append sink (the
BigQuery stand-in, SURVEY.md §2.1 S2) plus the console sink (S9).

Installed via ``[project.scripts]``::

    run_dq_job    --config configs/dq_orders_daily.yaml --fecha 1995-06-15
    run_profiling --config configs/profiling_core.yaml

Both functions accept ``argv`` (and reuse any live SparkSession via
``getOrCreate``) so tests drive them in-process; the shims call them
with ``sys.argv``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

DEFAULT_DATA_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def _data_dir_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--data-dir",
        default=DEFAULT_DATA_DIR,
        help="lake directory holding <table>.parquet files "
        "(default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)",
    )


def run_dq_job(argv: list[str] | None = None) -> int:
    """``run_dq_job``: the reference's DQ job shape
    (``orchestrate.md:286-291`` — ``--config``, ``--fecha``,
    ``--execution_date``). Compiles the YAML/JSON config, runs the
    single-pass check engine, applies threshold verdicts, prints the
    results table, optionally appends to a results sink, and routes
    ``on_failure``/``on_warning`` notifications. Exit code 0; with
    ``--strict``, 1 when any verdict is FAIL (the Airflow task-failure
    gate)."""
    p = argparse.ArgumentParser(prog="run_dq_job", description=run_dq_job.__doc__)
    p.add_argument("--config", required=True, help="YAML or JSON DQ job config")
    p.add_argument("--fecha", default=None,
                   help="partition date filter (overrides the config)")
    p.add_argument("--execution_date", "--execution-date", default=None,
                   dest="execution_date",
                   help="orchestrator timestamp, stamped on results")
    p.add_argument("--output", default=None,
                   help="parquet results sink (append mode)")
    p.add_argument("--notify-file", default=None,
                   help="JSONL notification sink (default: python logging)")
    p.add_argument("--rows", type=int, default=100,
                   help="console rows to print")
    p.add_argument("--strict", action="store_true",
                   help="exit 1 when any verdict is FAIL")
    _data_dir_arg(p)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.dq import (
        DQEngine,
        FileSender,
        LogSender,
        apply_thresholds,
        deliver_notifications,
        load_job_config,
    )
    from .session import get_spark

    config = load_job_config(args.config)
    if args.fecha:
        config["fecha"] = args.fecha
        if not config.get("date_column"):
            # o_orderdate is only a sane default for the orders table;
            # any other table must name its own date column or --fecha
            # would die later with an opaque AnalysisException.
            table = str(config.get("table_name", "")).rsplit(".", 1)[-1]
            if table == "orders":
                config["date_column"] = "o_orderdate"
            else:
                raise SystemExit(
                    "--fecha requires date_column in the config for "
                    f"table {config.get('table_name')!r} (only the "
                    "orders table has a default)"
                )
    spark = get_spark(app_name="run_dq_job")
    results = apply_thresholds(
        DQEngine(spark).run(config, sf_dir=args.data_dir), config
    )
    if args.execution_date:
        results = results.withColumn(
            "execution_date", F.lit(args.execution_date)
        )
    rows = [r.asDict() for r in results.collect()]
    print(results.limit(args.rows)._jdf.showString(args.rows, 0, False))
    if args.output:
        results.write.mode("append").parquet(args.output)
        print(f"appended {len(rows)} result rows -> {args.output}")
    sender = FileSender(args.notify_file) if args.notify_file else LogSender()
    payloads = deliver_notifications(rows, config, sender)
    n_fail = sum(r["verdict"] == "FAIL" for r in rows)
    print(
        json.dumps(
            {
                "table": config.get("table_name"),
                "fecha": config.get("fecha", "ALL"),
                "checks": len(rows),
                "fail": n_fail,
                "warn": sum(r["verdict"] == "WARN" for r in rows),
                "notifications": len(payloads),
            },
            sort_keys=True,
        )
    )
    return 1 if (args.strict and n_fail) else 0


def run_profiling(argv: list[str] | None = None) -> int:
    """``run_profiling``: the reference's profiling job shape
    (``profiling_example.py:1-33`` — config with ``tables``,
    optional ``fecha``/``date_column``/``sample_size``, ``run_id``,
    ``environment``, ``output_table``). Profiles every listed table in
    one fused pass, stamps run metadata, appends to the history sink,
    and prints the profile."""
    p = argparse.ArgumentParser(
        prog="run_profiling", description=run_profiling.__doc__
    )
    p.add_argument("--config", required=True,
                   help="YAML or JSON profiling config")
    p.add_argument("--output", default=None,
                   help="override the config's output_table parquet path")
    p.add_argument("--rows", type=int, default=60,
                   help="console rows to print")
    _data_dir_arg(p)
    args = p.parse_args(argv)

    from .operators.dq import load_job_config
    from .operators.profile import SimpleDataProfiler
    from .session import get_spark

    config = load_job_config(args.config)
    tables = config["tables"]
    spark = get_spark(app_name="run_profiling")
    profiler = SimpleDataProfiler(
        spark,
        settings={
            k: config[k] for k in ("sample_size",) if k in config
        },
    )
    prof = profiler.profile_multiple_tables(
        tables,
        args.data_dir,
        fecha=config.get("fecha"),
        date_column=config.get("date_column"),
    )
    prof = profiler.with_run_metadata(
        prof,
        environment=config.get("environment", "dev"),
        run_id=config.get("run_id"),
    )
    out = args.output or config.get("output_table")
    n = prof.count()
    print(prof.limit(args.rows)._jdf.showString(args.rows, 0, False))
    if out:
        profiler.append_history(prof, out)
        print(f"appended {n} profile rows -> {out}")
    print(
        json.dumps(
            {"tables": tables, "rows": n, "output": out}, sort_keys=True
        )
    )
    return 0


def _main_dq() -> None:  # console-script shim
    sys.exit(run_dq_job())


def _main_profiling() -> None:  # console-script shim
    sys.exit(run_profiling())
