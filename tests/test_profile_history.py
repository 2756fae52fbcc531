"""Profiler run-metadata stamping + append-sink history (reference
E3: stamp run_id/environment, APPEND to a results table)."""

from __future__ import annotations

import shutil

from gcp_dbt_data_engineering_spark.operators.profile import (
    PROFILE_TABLES,
    SimpleDataProfiler,
)

SF = "/root/testdata/sf0.001"
HIST = "/root/repo/.artifacts/profile_history"


def test_append_history_accumulates_runs(spark):
    shutil.rmtree(HIST, ignore_errors=True)
    p = SimpleDataProfiler(spark)
    one = p.with_run_metadata(
        p.profile_multiple_tables(PROFILE_TABLES[:1], SF), environment="dev"
    )
    n = one.count()
    assert n > 0
    p.append_history(one, HIST)
    two = p.with_run_metadata(
        p.profile_multiple_tables(PROFILE_TABLES[:1], SF), environment="prod"
    )
    p.append_history(two, HIST)

    hist = spark.read.parquet(HIST)
    assert hist.count() == 2 * n
    assert {r.environment for r in hist.select("environment").distinct().collect()} == {
        "dev",
        "prod",
    }
    # distinct run_id per append
    assert hist.select("run_id").distinct().count() == 2


def test_sample_size_caps_profiled_rows(spark):
    p = SimpleDataProfiler(spark, settings={"sample_size": 10})
    rows = p.profile_multiple_tables(["customer"], SF).collect()
    assert all(r.total_count == 10 for r in rows)


def test_console_sink_renders_profile(spark, capsys):
    p = SimpleDataProfiler(spark)
    df = p.profile_multiple_tables(["region"], SF)
    text = p.to_console(df)
    out = capsys.readouterr().out
    assert "column_name" in text and "r_name" in text
    assert "r_name" in out  # actually printed, not just returned
