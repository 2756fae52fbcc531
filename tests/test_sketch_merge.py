"""Sketch mergeability: partial states built on disjoint splits must
combine into exactly the full-data state — the property that makes
sketches the 100 TB path (per-shard/per-day partials merge without
rescanning rows). Streaming twins assert the same for micro-batch
merges (test_streaming.py); here the split is by key parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_dbt_data_engineering_spark.operators.sketch import (
    bloom_words,
    cm_cells,
    hll_registers,
)
from gcp_dbt_data_engineering_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def _halves(spark):
    ev = load_table(spark, SF, "events")
    return ev.filter("user_id % 2 = 0"), ev.filter("user_id % 2 = 1"), ev


def test_hll_registers_merge_by_max(spark):
    even, odd, full = _halves(spark)
    a = {r.bucket: r.m_j for r in hll_registers(even, "user_id").collect()}
    b = {r.bucket: r.m_j for r in hll_registers(odd, "user_id").collect()}
    merged = {
        k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)
    }
    f = {r.bucket: r.m_j for r in hll_registers(full, "user_id").collect()}
    assert merged == f


def test_hll_estimate_accuracy_raw_regime(spark):
    """The raw estimator must actually estimate: |est/true - 1| inside
    3σ ≈ 0.195 at m=256 (σ = 1.04/√m) once n >> 2.5m where the raw
    formula is valid. Guards the rank formula end-to-end — an
    off-by-one rank inflates every register and ~doubles the estimate,
    which the mergeability tests cannot catch."""
    from gcp_dbt_data_engineering_spark.operators.sketch import (
        HLL_M,
        HLL_PREFACTOR,
        hll_registers,
    )

    n = 50_000  # >> 2.5*m = 640: raw-estimator regime
    df = spark.range(1, n + 1).selectExpr("id AS user_id")
    regs = {r.bucket: r.m_j for r in hll_registers(df, "user_id").collect()}
    z_scaled = sum(
        1 << (24 - regs.get(b, 0)) for b in range(HLL_M)
    )
    est = HLL_PREFACTOR / float(z_scaled)
    assert abs(est / n - 1.0) < 0.2


def test_hll_small_range_corrected(spark):
    """At the sf0.01 cardinality (150 distinct < 2.5m) the spec
    intentionally reports the RAW estimate plus n_empty_buckets; the
    standard linear-counting correction m*ln(m/V) computed client-side
    from those two columns must land near truth. Documents the
    contract: the correction is the caller's libm step, the sketch
    columns are the portable part."""
    import math

    from gcp_dbt_data_engineering_spark.operators.sketch import (
        sketch_hll_distinct_users,
    )

    row = sketch_hll_distinct_users(spark, SF).collect()[0]
    assert row.true_distinct > 0
    assert row.n_empty_buckets > 0  # small-range regime at this SF
    corrected = row.m * math.log(row.m / row.n_empty_buckets)
    assert abs(corrected / row.true_distinct - 1.0) < 0.2


def test_countmin_counters_merge_by_sum(spark):
    even, odd, full = _halves(spark)

    def counters(df):
        return {
            (r.row, r.col): r.n
            for r in cm_cells(df, "user_id")
            .groupBy("row", "col")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    a, b, f = counters(even), counters(odd), counters(full)
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == f


def test_bloom_words_merge_by_bit_or(spark):
    orders = load_table(spark, SF, "orders")
    even = orders.filter("o_custkey % 2 = 0")
    odd = orders.filter("o_custkey % 2 = 1")

    def words(df):
        return {r.word: r.bits for r in bloom_words(df, "o_custkey").collect()}

    a, b = words(even), words(odd)
    merged = {k: a.get(k, 0) | b.get(k, 0) for k in set(a) | set(b)}
    assert merged == words(orders)


def test_hdr_buckets_merge_by_sum(spark):
    """HDR quantile-sketch state merges by per-bucket count sum —
    disjoint halves' bucket tables combine into exactly the
    full-data table (same algebra as count-min)."""
    from gcp_dbt_data_engineering_spark.operators.sketch import hdr_buckets

    orders = load_table(spark, SF, "orders").selectExpr(
        "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(22,6)) * 100 AS BIGINT) AS v",
    )
    def table(df):
        return {
            (r.bucket_id, r.lo): r.n
            for r in hdr_buckets(df, "v").collect()
        }

    a = table(orders.filter("o_orderkey % 2 = 0"))
    b = table(orders.filter("o_orderkey % 2 = 1"))
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == table(orders)


def test_hdr_estimate_error_bound(spark):
    """The sketch's whole contract: est <= true < est * (1 + 2^-B)
    for every reported quantile (values above the exact range)."""
    from gcp_dbt_data_engineering_spark.operators.sketch import (
        HDR_B,
        sketch_quantile_hdr_prices,
    )

    for r in sketch_quantile_hdr_prices(spark, SF).collect():
        assert r.est_cents <= r.true_cents
        assert r.true_cents < r.est_cents * (1 + 2.0 ** -HDR_B)


def _hdr_py(v: int):
    """Python mirror of _hdr_bucket_exprs — parity asserted against
    the SQL in test_hdr_bucket_sql_parity."""
    from gcp_dbt_data_engineering_spark.operators.sketch import HDR_B, HDR_W

    bi = max(v.bit_length() - 1 - HDR_B, 0)
    return bi, bi * HDR_W + (v >> bi), (v >> bi) << bi


def test_hdr_bucket_property_bounds():
    """Structural invariants on arbitrary values: lower bound never
    exceeds v; error bounded by 2^-B above the exact range; exact
    below it; bucket id nondecreasing in v (order-preserving, so the
    cumulative walk is a valid quantile estimator)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gcp_dbt_data_engineering_spark.operators.sketch import HDR_B

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=0, max_value=2**62))
    def check(v):
        _, bid, lo = _hdr_py(v)
        assert lo <= v
        if v < 1 << (HDR_B + 1):
            assert lo == v
        elif v > 0:
            assert (v - lo) / v <= 2.0 ** -HDR_B
        _, bid2, _ = _hdr_py(v + 1)
        assert bid2 >= bid

    check()


def test_hdr_bucket_sql_parity(spark):
    """The Python mirror above == the SQL expressions, over a batch of
    adversarial values (powers of two ± 1, range boundaries)."""
    from gcp_dbt_data_engineering_spark.operators.sketch import (
        _hdr_bucket_exprs,
    )

    vals = sorted(
        {0, 1, 2, 62, 63, 64, 65, 127, 128}
        | {(1 << k) + d for k in range(5, 62, 7) for d in (-1, 0, 1)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    _, bid, lo = _hdr_bucket_exprs("v")
    got = {
        r.v: (r.bid, r.lo)
        for r in df.selectExpr("v", f"{bid} AS bid", f"{lo} AS lo").collect()
    }
    for v in vals:
        _, pbid, plo = _hdr_py(v)
        assert got[v] == (pbid, plo), v


def test_kmv_set_ops_oracle_and_sketch_algebra(spark):
    """Oracle twin for sketch_kmv_set_ops, plus the theta-sketch
    invariants: union >= each input's retained sample, inclusion-
    exclusion holds EXACTLY on the sample counts (the three ops
    partition the below-theta sample pool), and the union estimate is
    within the k=256 KMV error band of the true union."""
    from gcp_dbt_data_engineering_spark.operators.sketch import (
        KMV_SET_K,
        SPECS,
    )
    from .oracle_harness import compare

    SF = "/root/testdata/sf0.01"
    spec = SPECS["sketch_kmv_set_ops"]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res

    rows = {r.op: r for r in spec.spark(spark, SF).collect()}
    assert set(rows) == {"union", "intersect", "a_minus_b"}
    u, i, d = rows["union"], rows["intersect"], rows["a_minus_b"]
    # same theta everywhere (the min of the two kth minima)
    assert u.theta_hash == i.theta_hash == d.theta_hash
    # sample pool partitions: union hits = (A∩B) + (A\B) + (B\A)
    assert u.sample_hits >= i.sample_hits + d.sample_hits
    assert u.sample_hits <= 2 * KMV_SET_K
    # estimator sanity: ~1/sqrt(k) relative error on the union
    assert u.true_count > 0
    rel = abs(u.estimate - u.true_count) / u.true_count
    assert rel < 4.0 / (KMV_SET_K ** 0.5)
    # intersection can never exceed the union, in truth or estimate
    assert i.true_count <= u.true_count
    assert i.estimate <= u.estimate + 1e-9


def test_kmv_under_full_sketches_are_exact(spark):
    """ADVICE r7: a set with fewer than k distinct keys is an EXACT
    sketch — its theta is P, the strict h < theta filter keeps every
    member (it used to drop the theta-defining max hash), and every
    estimate equals the true count with zero error."""
    import gcp_dbt_data_engineering_spark.operators.sketch as SK

    # 40 customers before the epoch, 30 after, 10 in both — all far
    # below k=256, so both sketches are under-full
    rows = []
    for c in range(1, 41):
        rows.append((c, "1997-06-01"))
    for c in range(31, 61):
        rows.append((c, "1998-06-01"))
    df = spark.createDataFrame(
        [(c, d) for c, d in rows], "o_custkey bigint, ds string"
    ).selectExpr("o_custkey", "CAST(ds AS TIMESTAMP) AS o_orderdate")
    df.createOrReplaceTempView("__kmv_small")
    orig = SK.load_table
    try:
        SK.load_table = lambda sp, sf, t: (
            sp.table("__kmv_small") if t == "orders" else orig(sp, sf, t)
        )
        out = {r.op: r for r in
               SK.sketch_kmv_set_ops(spark, "unused").collect()}
    finally:
        SK.load_table = orig
    assert out["union"].theta_hash == SK.P  # exact mode
    for op, truth in (("union", 60), ("intersect", 10),
                      ("a_minus_b", 30)):
        assert out[op].true_count == truth
        assert out[op].sample_hits == truth
        assert abs(out[op].estimate - truth) < 1e-9


def test_hll_sliding_window_oracle_and_calendar_merge(spark):
    """Oracle twin for sketch_hll_sliding_window; the trailing-week
    merge must equal registers REBUILT from the raw 7-day slice (the
    mergeability contract, day-partitioned), and after the linear-
    counting correction (client-side, from the reported empty-bucket
    count) the estimate lands within 3 sigma of the exact trailing
    distinct."""
    import math

    from gcp_dbt_data_engineering_spark.operators.sketch import (
        HLL_M,
        SPECS,
    )
    from .oracle_harness import compare

    SF = "/root/testdata/sf0.01"
    spec = SPECS["sketch_hll_sliding_window"]
    res = compare(spec.spark(spark, SF), spec.oracle, SF)
    assert res["match"], res

    rows = spec.spark(spark, SF).collect()
    assert len(rows) >= 7
    for r in rows:
        # small-range regime here: correct via linear counting
        v = r.n_empty_buckets
        est = HLL_M * math.log(HLL_M / v) if v > 0 else r.hll_estimate
        sigma = 1.04 / math.sqrt(HLL_M) * max(r.true_distinct_7d, 1)
        assert abs(est - r.true_distinct_7d) <= max(3 * sigma, 25), (
            r.day, est, r.true_distinct_7d
        )
