"""Python-UDTF API coverage: the UDTF twin of the props explode must
return exactly the JVM spec's rows. The UDTF is deliberately NOT the
benchmarked path (per-row Python generation was 3.3x the oracle); this
test is what keeps the API surface exercised and honest."""

from __future__ import annotations

from gcp_dbt_data_engineering_spark.plans.analytics import (
    events_props_udtf_stats,
    props_explode_udtf,
)

SF = "/root/testdata/sf0.001"


def test_udtf_matches_jvm_props_explode(spark):
    jvm = sorted(map(tuple, events_props_udtf_stats(spark, SF).collect()))
    py = sorted(map(tuple, props_explode_udtf(spark, SF).collect()))
    assert jvm == py
    assert len(jvm) > 0
