"""Streaming module: batch specs vs the DuckDB oracle at sf0.01, and
the Structured Streaming pipeline's equality with its batch twin."""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark.streaming.events import (
    SPECS,
    events_hourly_windows,
    run_hourly_stream,
)

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_streaming_batch_oracle_sf001(spark, name):
    spec = SPECS[name]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res


def test_stream_equals_batch(spark):
    """readStream→watermark→window→memory-sink == the batch plan
    (exact columns; n_users is HLL in streaming, exact in batch)."""
    exact = lambda r: (r.window_start, r.event_type, r.n_events, r.total_value)
    batch = {exact(r) for r in events_hourly_windows(spark, SF).collect()}
    stream = {
        exact(r)
        for r in run_hourly_stream(spark, SF, query_name="t_stream").collect()
    }
    assert stream == batch
    assert len(batch) > 100


def test_session_window_stream_equals_batch(spark):
    """Streaming native session_window == the batch session_window
    spec (per-user session count / event totals)."""
    from pyspark.sql import functions as F

    from gcp_dbt_data_engineering_spark.streaming.events import (
        events_session_window_native,
        run_session_window_stream,
    )

    batch = {
        (r.user_id, r.n_sessions, r.n_events, r.max_session_events)
        for r in events_session_window_native(spark, SF).collect()
    }
    per_sess = run_session_window_stream(
        spark, SF, query_name="t_sess_stream"
    )
    agg = (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_session_events"),
        )
    )
    stream = {
        (r.user_id, r.n_sessions, r.n_events, r.max_session_events)
        for r in agg.collect()
    }
    assert stream == batch
    assert len(batch) > 100


def test_stateful_user_totals_equals_batch(spark):
    """applyInPandasWithState running totals == batch groupBy."""
    from pyspark.sql import functions as F

    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_user_totals_stream,
    )

    res = run_user_totals_stream(spark, SF, query_name="t_user_totals")
    s = {r.user_id: (r.n_events, r.total_value) for r in res.collect()}
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    b = {r.user_id: (r.n, r.tv) for r in batch}
    assert set(s) == set(b) and len(b) == 150
    assert all(s[k][0] == b[k][0] for k in b)
    # double sums accumulate in different orders across the two plans
    assert all(
        abs(s[k][1] - b[k][1]) <= 1e-6 * max(1.0, abs(b[k][1])) for k in b
    )


def test_transform_with_state_equals_legacy_api(spark):
    """Spark 4 transformWithStateInPandas (StatefulProcessor +
    RocksDB state store) computes the same per-user running totals as
    the legacy applyInPandasWithState operator — the migration path
    for custom stateful logic is value-identical. Skips where
    google.protobuf (the API's wire protocol) is unavailable — this
    sandbox has no protobuf and installs are off-limits."""
    import pytest

    pytest.importorskip("google.protobuf")
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_user_totals_stream,
        run_user_totals_tws,
    )

    legacy = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_stream(
            spark, SF, query_name="t_tws_legacy"
        ).collect()
    }
    tws = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_tws(
            spark, SF, query_name="t_tws_new"
        ).collect()
    }
    assert set(tws) == set(legacy) and len(tws) == 150
    assert all(tws[k][0] == legacy[k][0] for k in legacy)
    assert all(
        abs(tws[k][1] - legacy[k][1]) <= 1e-6 * max(1.0, abs(legacy[k][1]))
        for k in legacy
    )


def test_streaming_dq_equals_batch_dq(spark):
    """foreachBatch + DQEngine over the stream == batch DQ run."""
    from gcp_dbt_data_engineering_spark.operators.dq import (
        EVENTS_DQ_CONFIG,
        DQEngine,
    )
    from gcp_dbt_data_engineering_spark.streaming.events import run_dq_stream

    cfg = {
        k: v
        for k, v in EVENTS_DQ_CONFIG.items()
        if k not in ("fecha", "date_column")
    }
    key = lambda r: (r.test_name, r.failed_records, r.total_records, r.status)
    stream_rows = sorted(key(r) for r in run_dq_stream(spark, SF).collect())
    batch_rows = sorted(
        key(r) for r in DQEngine(spark).run(cfg, sf_dir=SF).collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) == 10


def test_sessionize_invariants(spark):
    rows = SPECS["events_sessionize"].spark(spark, SF).collect()
    assert sum(r.n_events for r in rows) == 10_000  # every event in a session
    for r in rows:
        assert 1 <= r.n_sessions <= r.n_events
        assert r.max_session_events <= r.n_events


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream interval join emits exactly the batch pair set."""
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        _split_views_purchases,
        _view_purchase_plan,
        run_view_purchase_stream,
    )

    pairs = run_view_purchase_stream(spark, SF, query_name="t_vp")
    from pyspark.sql import functions as F

    stream_days = {
        (str(r.view_day), r.n_pairs)
        for r in pairs.groupBy(F.col("view_ts").cast("date").alias("view_day"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    }
    batch = _view_purchase_plan(
        *_split_views_purchases(load_table(spark, SF, "events"))
    )
    batch_days = {(str(r.view_day), r.n_pairs) for r in batch.collect()}
    assert stream_days == batch_days
    assert sum(n for _, n in batch_days) > 100


def test_watermark_dedup_equals_batch(spark):
    """Watermarked dropDuplicates == batch dropDuplicates key set."""
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        DEDUP_KEYS,
        _with_minute,
        run_minute_dedup_stream,
    )

    stream_keys = {
        (r.user_id, r.event_type, r.minute)
        for r in run_minute_dedup_stream(spark, SF, query_name="t_dd")
        .select(*DEDUP_KEYS)
        .collect()
    }
    batch_keys = {
        (r.user_id, r.event_type, r.minute)
        for r in _with_minute(load_table(spark, SF, "events"))
        .dropDuplicates(DEDUP_KEYS)
        .select(*DEDUP_KEYS)
        .collect()
    }
    assert stream_keys == batch_keys
    assert len(batch_keys) > 5000


def test_hll_register_stream_equals_batch(spark):
    """Streaming HLL register table == batch register table: the
    sketch's mergeable-state property, end to end through a
    complete-mode stream."""
    from gcp_dbt_data_engineering_spark.operators.sketch import hll_registers
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_hll_register_stream,
    )

    stream = {
        (r.bucket, r.m_j)
        for r in run_hll_register_stream(spark, SF, query_name="t_hll")
        .collect()
    }
    batch = {
        (r.bucket, r.m_j)
        for r in hll_registers(load_table(spark, SF, "events"), "user_id")
        .collect()
    }
    assert stream == batch
    assert len(batch) > 100


def test_countmin_stream_equals_batch(spark):
    """Streaming count-min counter table == batch counter table: the
    sum-merge sketch algebra under streaming state (HLL covers the
    max-merge algebra)."""
    from pyspark.sql import functions as F

    from gcp_dbt_data_engineering_spark.operators.sketch import cm_cells
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_countmin_stream,
    )

    stream = {
        (r.row, r.col, r.n)
        for r in run_countmin_stream(spark, SF, query_name="t_cm").collect()
    }
    batch = {
        (r.row, r.col, r.n)
        for r in cm_cells(load_table(spark, SF, "events"), "user_id")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stream == batch
    assert len(batch) > 300


def test_hdr_bucket_stream_equals_batch(spark):
    """Streamed HDR quantile buckets == batch build over the same
    cents column (sum-merge algebra under streaming state)."""
    from gcp_dbt_data_engineering_spark.operators.sketch import hdr_buckets
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_hdr_bucket_stream,
    )

    streamed = {
        (r.bucket_id, r.lo): r.n
        for r in run_hdr_bucket_stream(spark, SF, query_name="t_hdr").collect()
    }
    cents = load_table(spark, SF, "events").selectExpr(
        "CAST(CAST(value AS DECIMAL(22,6)) * 100 AS BIGINT) AS v"
    )
    batch = {
        (r.bucket_id, r.lo): r.n for r in hdr_buckets(cents, "v").collect()
    }
    assert streamed == batch and len(batch) > 5


def test_bloom_word_stream_equals_batch(spark):
    """Streamed Bloom words (no pre-dedup; OR is idempotent) == the
    batch distinct-key build, bit for bit."""
    from gcp_dbt_data_engineering_spark.operators.sketch import bloom_words
    from gcp_dbt_data_engineering_spark.sources import load_table
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_bloom_word_stream,
    )

    streamed = {
        r.word: r.bits
        for r in run_bloom_word_stream(
            spark, SF, query_name="t_bloom"
        ).collect()
    }
    batch = {
        r.word: r.bits
        for r in bloom_words(
            load_table(spark, SF, "events"), "user_id"
        ).collect()
    }
    assert streamed == batch and len(batch) > 10


def test_stateful_checkpoint_kill_and_resume(spark, tmp_path):
    """Durability (VERDICT r5 item 8): a checkpointed stateful stream
    stopped after batch 1 and RESTARTED must (a) not reprocess batch
    1's file (exactly-once source offsets) and (b) resume from the
    recovered per-key state — user 1's total after the restart equals
    batch1 + batch2, while untouched user 2 is not re-emitted."""
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_user_totals_resumable,
    )

    inp = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    inp.mkdir()

    def land(fname, rows):
        spark.createDataFrame(
            rows, "user_id bigint, value double"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage")
        )
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
        shutil.copy(part, str(inp / fname))

    land("f1.parquet", [(1, 10.0), (1, 5.0), (2, 7.0)])
    run1 = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_resumable(
            spark, str(inp), ckpt, "t_resume_1"
        ).collect()
    }
    assert run1 == {1: (2, 15.0), 2: (1, 7.0)}

    # the query is stopped; a second file lands, then a fresh query
    # restarts from the SAME checkpoint
    land("f2.parquet", [(1, 100.0), (3, 1.0)])
    run2 = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_resumable(
            spark, str(inp), ckpt, "t_resume_2"
        ).collect()
    }
    # user 1: state recovered (2,15) + batch2 → (3,115); user 3 fresh;
    # user 2 untouched by batch 2 → NOT re-emitted (proves f1 was not
    # reprocessed after the restart)
    assert run2 == {1: (3, 115.0), 3: (1, 1.0)}


def test_cusum_stream_equals_batch_recurrence(spark):
    """The stateful CUSUM stream must emit exactly the batch recurrence
    over the events daily series (single-micro-batch fixture)."""
    from gcp_dbt_data_engineering_spark.operators.dq import (
        _CUSUM_H_PM,
        _CUSUM_K_PM,
    )
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_cusum_stream,
    )

    SF = "/root/testdata/sf0.001"
    got = {
        r.day: r for r in run_cusum_stream(spark, SF, "cusum_s1").collect()
    }

    import pyspark.sql.functions as F

    daily = sorted(
        (r.day, r.n)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select(F.col("ts").cast("timestamp").cast("date")
                .cast("string").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    T = sum(n for _, n in daily)
    N = len(daily)
    sk, sh = _CUSUM_K_PM * T, _CUSUM_H_PM * T
    sp = sn = 0
    assert len(got) == N
    for day, n in daily:
        sdev = 1000 * N * n - 1000 * T
        sp = max(0, sp + sdev - sk)
        sn = max(0, sn - sdev - sk)
        r = got[day]
        assert r.n == n
        assert r.cusum_pos == sp / float(1000 * N)
        assert r.cusum_neg == sn / float(1000 * N)
        assert r.alarm_pos == (sp > sh)
        assert r.alarm_neg == (sn > sh)


def test_stream_equals_batch_on_adversarial_corpus(spark):
    """Stream-vs-batch equality must hold on the adversarial corpus
    too (NULL timestamps, duplicate event ids, 1970/2099 times): both
    paths share the explicit timeless-row boundary instead of the
    batch filtering and the stream silently relying on the watermark
    operator's null-event-time drop."""
    import os
    import subprocess
    import sys

    corpus = "/root/repo/.artifacts/sf0.01_nasty"
    if not os.path.exists(os.path.join(corpus, "events.parquet")):
        subprocess.run(
            [sys.executable, "/root/repo/tools/make_nasty.py"], check=True
        )
    exact = lambda r: (  # noqa: E731
        r.window_start, r.event_type, r.n_events, r.total_value
    )
    batch = {exact(r) for r in events_hourly_windows(spark, corpus).collect()}
    stream = {
        exact(r)
        for r in run_hourly_stream(
            spark, corpus, query_name="t_stream_nasty"
        ).collect()
    }
    assert stream == batch
    assert len(batch) > 100
