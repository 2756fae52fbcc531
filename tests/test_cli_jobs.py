"""The two console entry points (VERDICT r9 item 7): ``run_dq_job`` /
``run_profiling`` reproduce the reference's Dataproc job shapes
(``tests/orchestrate.md:278-301``: dq_checker.py --config --fecha
--execution_date; ``tests/profiling_example.py:1-33``: config-driven
profiling with run metadata + APPEND sink) as spark-submit-able CLIs.

Driven in-process (the CLIs getOrCreate onto the test session) so the
whole matrix costs one JVM; a shim check asserts the installed console
scripts resolve to the same callables.
"""

from __future__ import annotations

import json
import shutil

import pytest
import yaml

from gcp_dbt_data_engineering_spark.cli import run_dq_job, run_profiling

SF = "/root/testdata/sf0.01"


def test_run_dq_job_end_to_end(spark, tmp_path, capsys):
    out = str(tmp_path / "dq_results")
    notif = str(tmp_path / "notif.jsonl")
    rc = run_dq_job(
        [
            "--config", "configs/dq_orders_daily.yaml",
            "--fecha", "1995-06-15",
            "--execution_date", "1995-06-16T00:00:00",
            "--data-dir", SF,
            "--output", out,
            "--notify-file", notif,
        ]
    )
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "format_o_orderpriority_length_3" in stdout  # console sink
    summary = json.loads(stdout.strip().splitlines()[-1])
    assert summary["checks"] == 13 and summary["fail"] == 2
    # results sink: appended parquet with verdicts + execution stamp
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 13
    byname = {r.test_name: r for r in rows}
    assert byname["format_o_custkey_numeric_11"].verdict == "FAIL"
    assert byname["uniqueness_o_orderkey"].verdict == "PASS"
    assert rows[0].execution_date == "1995-06-16T00:00:00"
    # notification routing: one failure payload to the config recipients
    payloads = [json.loads(l) for l in open(notif)]
    assert len(payloads) == 1 and payloads[0]["level"] == "failure"
    assert "format_o_custkey_numeric_11" in payloads[0]["tests"]
    # the Airflow task-failure gate
    assert (
        run_dq_job(
            ["--config", "configs/dq_orders_daily.yaml",
             "--fecha", "1995-06-15", "--data-dir", SF, "--strict"]
        )
        == 1
    )


def test_run_profiling_end_to_end(spark, tmp_path, capsys):
    cfg = {
        "tables": ["orders", "customer"],
        "environment": "ci",
        "run_id": "run-42",
        "fecha": "1995-06-15",
        "date_column": "o_orderdate",
        "output_table": str(tmp_path / "history"),
    }
    cfg_path = tmp_path / "profiling.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = run_profiling(["--config", str(cfg_path), "--data-dir", SF])
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    assert summary["tables"] == ["orders", "customer"]
    hist = spark.read.parquet(cfg["output_table"])
    rows = hist.collect()
    assert len(rows) == summary["rows"] > 0
    assert {r.table_name for r in rows} == {"orders", "customer"}
    assert all(r.run_id == "run-42" and r.environment == "ci" for r in rows)
    # the fecha filter reached the orders scan: 5 orders that day at sf0.01
    orders_total = {
        r.column_name: r for r in rows if r.table_name == "orders"
    }
    assert all(r.total_count == 5 for r in orders_total.values())
    # APPEND semantics: a second run accumulates, never truncates
    assert run_profiling(["--config", str(cfg_path), "--data-dir", SF]) == 0
    assert spark.read.parquet(cfg["output_table"]).count() == 2 * len(rows)


def test_console_script_shims_installed():
    """The install registered both [project.scripts] shims and they
    reach argparse (cheap: --help never builds a session)."""
    import subprocess

    for name in ("run_dq_job", "run_profiling"):
        path = shutil.which(name)
        if path is None:
            pytest.skip("package not pip-installed in this environment")
        out = subprocess.run(
            [path, "--help"], capture_output=True, text=True, timeout=60
        )
        assert out.returncode == 0 and "--config" in out.stdout
