"""Hierarchical greedy packing: distributed-contract guarantees.

The operator's 100 TB posture is shard-local greedy with stitched bin
ids (see pack_sequences_greedy docstring). These tests drive the
factored core with synthetic data — including one pathologically
skewed source — and replay the identical shard/pack/stitch contract in
plain Python, so the JVM aggregate-lambda is checked against an
independent implementation, not just the DuckDB oracle text.
"""

from __future__ import annotations

from gcp_dbt_data_engineering_spark.operators.pipeline import (
    PACK_BUDGET,
    PACK_SHARD_BUDGET,
    greedy_pack,
)


def _reference_pack(rows):
    """Shard-local greedy replayed in pure Python.

    rows: list of (doc_id, source, n_tokens); returns
    {(source, bin_id): (n_docs, bin_tokens)}.
    """
    by_source: dict[str, list[tuple]] = {}
    for doc_id, source, n in rows:
        by_source.setdefault(source, []).append((doc_id, n))
    out: dict[tuple, list[int]] = {}
    for source, docs in by_source.items():
        docs.sort()
        # shard by prefix-sum position
        shards: dict[int, list[int]] = {}
        start = 0
        for _, n in docs:
            shards.setdefault(start // PACK_SHARD_BUDGET, []).append(n)
            start += n
        base = 0
        for shard_id in sorted(shards):
            fill, local = 0, 0
            for n in shards[shard_id]:
                if fill > 0 and fill + n > PACK_BUDGET:
                    local += 1
                    fill = 0
                fill += n
                key = (source, base + local)
                agg = out.setdefault(key, [0, 0])
                agg[0] += 1
                agg[1] += n
            base += local + 1
    return {k: tuple(v) for k, v in out.items()}


def _run(spark, rows):
    toks = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    got = {
        (r.source, r.bin_id): (r.n_docs, r.bin_tokens)
        for r in greedy_pack(toks).collect()
    }
    assert got == _reference_pack(rows)
    return got


def test_greedy_pack_skewed_source(spark):
    """One source with 4000 docs (many shards) next to tiny sources:
    per-task state stays shard-bounded and results match the
    reference replay. Also asserts the skewed source actually split
    into multiple shards (the contract's whole point)."""
    rows = [(i, "hot", 40 + (i * 7) % 200) for i in range(4000)]
    rows += [(10_000 + i, "cold_a", 30) for i in range(5)]
    rows += [(20_000 + i, "cold_b", 300) for i in range(3)]
    got = _run(spark, rows)
    hot_tokens = sum(n for _, s, n in rows if s == "hot")
    assert hot_tokens > 3 * PACK_SHARD_BUDGET  # genuinely multi-shard
    n_hot_bins = sum(1 for (s, _) in got if s == "hot")
    assert n_hot_bins > hot_tokens // PACK_BUDGET  # bins exist per budget


def test_greedy_pack_oversized_and_zero_docs():
    """Pure-contract corners in the reference replay: an over-budget
    doc gets its own bin; a zero-token doc after an over-full bin
    still triggers the reset (fill + 0 > budget) and lands in the
    NEXT bin — the same rule both engines implement."""
    rows = [
        (1, "s", 100),
        (2, "s", PACK_BUDGET + 50),  # oversized: own bin
        (3, "s", 0),  # over-full fill forces a reset; joins next bin
        (4, "s", 200),
    ]
    ref = _reference_pack(rows)
    assert ref[("s", 0)] == (1, 100)
    assert ref[("s", 1)] == (1, PACK_BUDGET + 50)
    assert ref[("s", 2)] == (2, 200)


def test_greedy_pack_spark_matches_reference_corners(spark):
    rows = [
        (1, "s", 100),
        (2, "s", PACK_BUDGET + 50),
        (3, "s", 0),
        (4, "s", 200),
        (5, "t", PACK_SHARD_BUDGET),  # exactly one shard of tokens
        (6, "t", 1),
    ]
    _run(spark, rows)


def test_greedy_pack_randomized_instances(spark):
    """300 random docs across 7 sources with adversarial token-count
    distribution (zeros, budget-sized, oversized, heavy tail) — the
    JVM lambda must match the pure-Python replay on all of them in
    one batch. Seeded: deterministic, no flake."""
    import random

    rng = random.Random(20260814)
    rows = []
    for i in range(300):
        source = f"s{rng.randrange(7)}"
        r = rng.random()
        if r < 0.1:
            n = 0
        elif r < 0.2:
            n = PACK_BUDGET + rng.randrange(0, 200)
        elif r < 0.3:
            n = rng.choice([PACK_BUDGET, PACK_BUDGET - 1, 1])
        else:
            n = rng.randrange(1, 180)
        rows.append((i, source, n))
    _run(spark, rows)


def test_two_phase_prefix_sum_equals_window_on_skew(spark):
    """The distributed two-phase scan must equal the plain per-source
    window prefix sum, including on a 90 %-hot source (the regime the
    rewrite targets) and with non-contiguous doc_ids."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from gcp_dbt_data_engineering_spark.operators.pipeline import (
        two_phase_prefix_sum,
    )

    rows = [
        (i * 7 + 3, "hot" if i % 10 else f"cold{i % 3}", (i * 37) % 90 + 1)
        for i in range(1500)
    ]
    toks = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = toks.withColumn(
        "start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).select("doc_id", "start")
    got = two_phase_prefix_sum(
        toks, "source", "doc_id", "n_tokens", "start"
    ).select("doc_id", "start")
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, got.collect())
    )


def test_two_phase_prefix_sum_negative_and_sparse_order(spark):
    """Truncating div is monotone over negatives too — the bucket map
    must preserve order for any integral order column, including
    negative and widely-sparse ids."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from gcp_dbt_data_engineering_spark.operators.pipeline import (
        two_phase_prefix_sum,
    )

    rows = [
        ((i - 50) * 9973, "s" if i % 4 else "t", i % 7 + 1)
        for i in range(100)
    ]
    toks = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = toks.withColumn(
        "start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).select("doc_id", "start")
    got = two_phase_prefix_sum(
        toks, "source", "doc_id", "n_tokens", "start", bucket_width=64
    ).select("doc_id", "start")
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, got.collect())
    )
