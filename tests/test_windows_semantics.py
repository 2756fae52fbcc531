"""Independent semantic checks for the window/set-op/as-of pack.

The oracle gate proves Spark == DuckDB, but the as-of oracle is written
with the same running-window construction as the Spark plan — a shared
reasoning bug would be invisible to it. These tests pin the semantics
against definitionally-direct (quadratic) implementations at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_dbt_data_engineering_spark.plans.windows import (
    VALUE_BANDS,
    events_asof_attribution,
    events_value_band_join,
    part_brand_set_ops,
)
from gcp_dbt_data_engineering_spark.sources import load_table

from .conftest import SF_SMOKE


def test_asof_matches_naive_self_join(spark):
    """Window as-of == argmax over the inequality self-join."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("us").alias("p_us")
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("us").alias("t_us"),
    )
    # naive: every (purchase, earlier-or-equal touch) pair, then argmax.
    # "earlier" in the spec's total order (ts, event_id).
    naive = (
        purchases.join(
            touches,
            (F.col("user_id") == F.col("t_user"))
            & (
                (F.col("t_us") < F.col("p_us"))
                | ((F.col("t_us") == F.col("p_us")) & (F.col("t_id") < F.col("p_id")))
            ),
            "left",
        )
        .groupBy("user_id", "p_id", "p_us")
        .agg(
            F.max("t_us").alias("last_touch_us"),
            F.count("t_id").alias("n_prior_touches"),
        )
    )
    got = {
        r["event_id"]: (r["last_touch_us"], r["n_prior_touches"])
        for r in events_asof_attribution(spark, SF_SMOKE).collect()
    }
    want = {
        r["p_id"]: (r["last_touch_us"], r["n_prior_touches"])
        for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_band_join_covers_all_events(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    lo, hi = VALUE_BANDS[0][1], VALUE_BANDS[-1][2]
    in_range = ev.filter((F.col("value") >= lo) & (F.col("value") < hi)).count()
    banded = events_value_band_join(spark, SF_SMOKE)
    assert banded.agg(F.sum("n_events")).collect()[0][0] == in_range
    assert banded.count() <= len(VALUE_BANDS)


def test_set_ops_partition_the_union(spark):
    rows = part_brand_set_ops(spark, SF_SMOKE).collect()
    by_brand: dict[str, list[str]] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r["membership"])
    # each brand appears exactly once — the three membership classes
    # partition (no overlap, no duplicates)
    assert all(len(v) == 1 for v in by_brand.values())
    part = load_table(spark, SF_SMOKE, "part")
    union_n = (
        part.filter((F.col("p_size") >= 45) | (F.col("p_type") == "PROMO"))
        .select("p_brand")
        .distinct()
        .count()
    )
    assert len(by_brand) == union_n


def test_interval_join_matches_naive_theta(spark):
    """W-bucket banding == the direct theta join it replaces."""
    from gcp_dbt_data_engineering_spark.plans.windows import (
        INTERVAL_W_US,
        events_interval_join,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("us").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_id"),
        F.col("us").alias("c_us"),
    )
    naive = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_us") >= F.col("p_us") - INTERVAL_W_US)
            & (F.col("c_us") < F.col("p_us")),
            "left",
        )
        .groupBy("p_id")
        .agg(
            F.count("c_id").alias("n"),
            F.max("c_us").alias("last_us"),
        )
    )
    got = {
        r["purchase_id"]: (r["n_clicks_1h"], r["last_click_us"])
        for r in events_interval_join(spark, SF_SMOKE).collect()
    }
    want = {r["p_id"]: (r["n"], r["last_us"]) for r in naive.collect()}
    assert got == want and len(got) > 0
    assert any(n > 0 for n, _ in got.values())
