"""Real watermark semantics under MULTIPLE micro-batches.

The fixture suite deliberately pins a single micro-batch (stream ==
batch exactness); this test forces two micro-batches over a two-file
corpus (maxFilesPerTrigger=1) so the 2-hour watermark actually
advances between them, and asserts the GUARANTEED append-mode window
contract:

- a window is emitted only after the watermark passes its end, and
  never retracted/updated afterwards (append-only);
- a straggler arriving AFTER its window was finalized and evicted is
  dropped: the emitted count stays the pre-straggler one and no
  second (window) row appears;
- windows the watermark has not passed stay unemitted at end of
  input.

(Caveat pinned by the batch layout below: the watermark advances with
a ONE-BATCH lag — a late row landing in the same batch that first
runs under the advanced watermark can still merge into live state, so
the straggler here arrives two batches after the max-advancing event.)
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _write_events(path: str, rows, mtime: float) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), type=pa.int64()),
                "ts": pa.array(rows, type=pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), type=pa.int64()),
                "event_type": pa.array(["a"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def test_watermark_finalizes_evicts_and_withholds(spark, tmp_path):
    d = str(tmp_path / "stream_src")
    os.makedirs(d)
    now = time.time()
    # The watermark advances with a one-batch lag (batch N runs under
    # the watermark computed from batches <= N-1), so the straggler
    # must arrive two batches after the event that advances max event
    # time, or it would still find its window's state live and merge.
    # batch 0: two t0-window rows + the max-advancing t0+6h row
    _write_events(
        f"{d}/events-a.parquet",
        [T0, T0 + timedelta(minutes=10), T0 + timedelta(hours=6)],
        now - 180,
    )
    # batch 1 runs under watermark t0+4h -> at its end the t0 window
    # (end 01:00) is finalized with count 2 and its state evicted
    _write_events(
        f"{d}/events-b.parquet",
        [T0 + timedelta(hours=6, minutes=10)],
        now - 120,
    )
    # batch 2: a straggler back in the long-finalized t0 window, plus
    # an on-time t0+7h row whose window stays open at end of input
    _write_events(
        f"{d}/events-c.parquet",
        [T0 + timedelta(minutes=20), T0 + timedelta(hours=7)],
        now - 60,
    )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH").alias("h"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r.h, r.n) for r in spark.table("t_wm").collect()]

    t0_counts = sorted(n for h, n in rows if h == "2026-01-01 00")
    # finalized once with batch-0's two rows; the straggler found the
    # state evicted and the watermark ahead, and was DROPPED — no
    # merge (count stays 2), no retraction, no duplicate emission
    assert t0_counts == [2]
    # the 06h and 07h windows end after the final watermark (t0+5h):
    # append mode must not have emitted either yet
    assert all(h in ("2026-01-01 00",) for h, _ in rows)
