"""spread(): file-size-based split estimation (no df.rdd analysis)."""

from __future__ import annotations

import shutil

from gcp_dbt_data_engineering_spark.sources import load_table, spread

ART = "/root/repo/.artifacts/spread_test"


def test_single_split_fixture_gets_repartitioned(spark):
    df = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = spread(df)
    assert out is not df  # one small file -> repartition applied
    assert out.rdd.getNumPartitions() >= 8


def test_multi_file_source_left_alone(spark):
    shutil.rmtree(ART, ignore_errors=True)
    load_table(spark, "/root/testdata/sf0.001", "orders").repartition(
        8
    ).write.parquet(ART)
    df = spark.read.parquet(ART)
    # 8 files >= max(2, defaultParallelism // 2) on local[8] -> the
    # scan is already split; spread must be a no-op (no extra shuffle)
    assert spread(df) is df
    shutil.rmtree(ART, ignore_errors=True)
