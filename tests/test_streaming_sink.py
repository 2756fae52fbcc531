"""Production parquet upsert sink for the resumable stateful stream
(VERDICT r7 item 4): end-to-end totals, batch replay idempotence, and
checkpointed resume — next to the collect-based harness, which stays
test-only."""

from __future__ import annotations

import glob
import shutil


def _land(spark, tmp_path, inp, fname, rows):
    spark.createDataFrame(
        rows, "user_id bigint, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
    shutil.copy(part, str(inp / fname))


def test_parquet_sink_totals_replay_idempotence_and_resume(
    spark, tmp_path
):
    from gcp_dbt_data_engineering_spark.streaming.events import (
        run_user_totals_parquet_sink,
        user_totals_from_sink,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    _land(spark, tmp_path, inp, "f1.parquet", [(1, 10.0), (1, 5.0), (2, 7.0)])
    _land(spark, tmp_path, inp, "f2.parquet", [(1, 100.0), (3, 1.0)])
    out = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_parquet_sink(
            spark, str(inp), ckpt, sink, "t_sink_1"
        ).collect()
    }
    # maxFilesPerTrigger=1 → two micro-batches; last-writer-wins per
    # key must equal the plain batch aggregate
    assert out == {1: (3, 115.0), 2: (1, 7.0), 3: (1, 1.0)}
    batch_dirs = sorted(
        p.name for p in (tmp_path / "sink").iterdir()
        if p.name.startswith("batch_id=")
    )
    assert batch_dirs == ["batch_id=0", "batch_id=1"]

    # REPLAY: simulate the at-least-once failure mode — foreachBatch
    # re-runs a committed batch with the same batch_id and rows. The
    # partition overwrite must leave the resolved state unchanged.
    batch1 = spark.createDataFrame(
        [(1, 3, 115.0), (3, 1, 1.0)],
        "user_id bigint, n_events bigint, total_value double",
    )
    batch1.write.mode("overwrite").parquet(f"{sink}/batch_id=1")
    replayed = {
        r.user_id: (r.n_events, r.total_value)
        for r in user_totals_from_sink(spark, sink).collect()
    }
    assert replayed == out

    # RESUME: a third file lands; a fresh query on the same checkpoint
    # processes ONLY it (exactly-once offsets) and upserts on top
    _land(spark, tmp_path, inp, "f3.parquet", [(2, -7.0), (4, 9.0)])
    out2 = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_user_totals_parquet_sink(
            spark, str(inp), ckpt, sink, "t_sink_2"
        ).collect()
    }
    assert out2 == {1: (3, 115.0), 2: (2, 0.0), 3: (1, 1.0), 4: (1, 9.0)}
    # only one new batch partition appeared — f1/f2 not reprocessed
    batch_dirs2 = sorted(
        p.name for p in (tmp_path / "sink").iterdir()
        if p.name.startswith("batch_id=")
    )
    assert batch_dirs2 == ["batch_id=0", "batch_id=1", "batch_id=2"]
