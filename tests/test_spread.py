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


def test_parse_bytes_suffixes():
    from gcp_dbt_data_engineering_spark.sources.registry import _parse_bytes

    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("64") == 64
    import pytest

    with pytest.raises(Exception):
        _parse_bytes("128x")


def test_clear_caches_unpersists(spark):
    from gcp_dbt_data_engineering_spark.operators.dedup import _shingle_rows
    from gcp_dbt_data_engineering_spark.session import clear_caches

    sh = _shingle_rows(spark, "/root/testdata/sf0.001")
    assert sh.is_cached
    assert clear_caches(spark) >= 1
    assert not sh.is_cached
    assert "_graft_shingle_cache" not in spark.__dict__
    # re-derivable after the clear
    assert _shingle_rows(spark, "/root/testdata/sf0.001").count() > 0


def test_staging_layout(spark, tmp_path):
    """Single-row-group tables >= STAGE_MIN_BYTES are rewritten once
    into a splittable multi-file layout; small tables stay raw; stale
    stagings of the same (table, sf) are pruned; other SFs survive."""
    import os

    from gcp_dbt_data_engineering_spark.sources import registry as reg

    sf = "/root/testdata/sf0.1"
    p = reg.table_path(sf, "lineitem")
    staged = reg._stage_if_unsplittable(spark, p, "lineitem", sf)
    assert staged != p and os.path.exists(os.path.join(staged, "_SUCCESS"))
    n_files = len([f for f in os.listdir(staged) if f.endswith(".parquet")])
    assert n_files > 1  # splittable now
    # idempotent: second call reuses, no rewrite
    assert reg._stage_if_unsplittable(spark, p, "lineitem", sf) == staged
    # small table untouched
    pr = reg.table_path(sf, "region")
    assert reg._stage_if_unsplittable(spark, pr, "region", sf) == pr
    # stale-layout prune: plant a fake old staging of same (table, sf)
    fake = os.path.join(reg.STAGE_DIR, "lineitem@sf0.1-0-0")
    os.makedirs(fake, exist_ok=True)
    other_sf = os.path.join(reg.STAGE_DIR, "lineitem@sf0.01-0-0")
    os.makedirs(other_sf, exist_ok=True)
    import shutil

    shutil.rmtree(staged)  # force a re-stage so the prune branch runs
    staged2 = reg._stage_if_unsplittable(spark, p, "lineitem", sf)
    assert os.path.exists(os.path.join(staged2, "_SUCCESS"))
    assert not os.path.exists(fake)  # same (table, sf): pruned
    assert os.path.exists(other_sf)  # other sf: untouched
    shutil.rmtree(other_sf, ignore_errors=True)
