"""Training-data pipeline operators: contamination checks, stratified
sampling, domain mixing, PII redaction, and sequence packing.

North-star [EXT] surface (SURVEY.md §2, "operations a large-scale
training-data pipeline would need") built on the same portable-hash
toolkit as the dedup family (``texthash.py``) so every operator has a
bit-identical DuckDB oracle. The reference's own sampling hook is the
profiler's ``sample_size`` setting (`tests/profiling_example.py:54`)
and its per-partition batch discipline (`tests/example_templates.yaml:58`);
these operators generalize that to corpus curation.

Scale posture (100 TB):

- Every sampling decision is a pure per-row hash predicate — no
  shuffle, no ``df.sample`` RNG (which is neither reproducible across
  engines nor stable under repartitioning). Rates arrive as broadcast
  single-row/dimension-sized joins.
- Contamination keys the join on 8-byte shingle hashes with the
  benchmark side broadcast (benchmarks are MBs, corpora are TBs).
- Both packing strategies ride ``two_phase_prefix_sum`` — the
  distributed scan (bucket partials + tiny-offset stitch) — so no
  window task ever holds a whole source; greedy packing is
  additionally hierarchical: capacity-bounded shards packed
  independently by a JVM aggregate lambda, bin ids stitched by a
  (two-phase) bins-per-shard prefix sum — per-task state is
  shard-bounded no matter how skewed the sources are.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, spread
from ..plans.spec import QuerySpec
from . import texthash as th

# ---------------------------------------------------------------------------
# 1. benchmark-contamination check — n-gram overlap vs a benchmark set
# ---------------------------------------------------------------------------

CONTAM_N = 5
BENCH_SOURCES = ("src0", "src1")


def _contam_shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, source, 5-gram hash) rows, staged once.

    Same bounded per-(session, corpus) persist discipline as
    ``dedup._shingle_rows`` (which holds the 3-gram relation): the
    5-gram fold is the CPU of both contamination operators, and this
    is the relation a production pipeline materializes per corpus
    snapshot. Spread before the fold — the fixture parquet is one
    scan split.
    """
    cache: dict[str, DataFrame] = spark.__dict__.setdefault(
        "_graft_contam_shingle_cache", {}
    )
    hit = cache.get(sf_dir)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    df = (
        docs.selectExpr(
            "doc_id",
            "source",
            f"{th.shingle_hashes('text', CONTAM_N, 'spark')} AS hs",
        )
        .select("doc_id", "source", F.explode("hs").alias("h"))
        .distinct()
        .persist()
    )
    cache[sf_dir] = df
    return df


def contamination_ngram_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram overlap rate against the benchmark sources.

    The decontamination primitive: distinct n-gram hashes per doc,
    semi-join against the (broadcast) benchmark hash set, hit-count /
    total. Docs shorter than ``CONTAM_N`` words have no shingles and
    drop out (same in the oracle).
    """
    from pyspark.sql.window import Window

    sh = _contam_shingle_rows(spark, sf_dir)
    # Single-pass shape: referencing `sh` from separate bench/candidate
    # branches makes Spark recompute the shingle fold once PER BRANCH
    # (filter pushdown specializes each branch's scan, so no exchange
    # reuse — measured 3x the operator's CPU), and a persist() would
    # leak cached blocks into the caller's session. Instead flag each
    # hash's bench membership with one window over h — shingles are
    # computed exactly once, no cache, no broadcast build. At 100 TB
    # with a small benchmark set, stage `sh` to a table once and use
    # the broadcast semi-join variant instead; the window-by-h shuffle
    # here is the right trade only while the corpus side dominates.
    in_bench = F.max(
        F.when(F.col("source").isin(*BENCH_SOURCES), 1).otherwise(0)
    ).over(Window.partitionBy("h"))
    return (
        sh.withColumn("b", in_bench)
        .filter(~F.col("source").isin(*BENCH_SOURCES))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("b").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination_rate"),
        )
    )


def _sql_in(vals: Iterable[str]) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


# ---------------------------------------------------------------------------
# 1b. external-benchmark decontamination — broadcast phrase set
# ---------------------------------------------------------------------------

#: the "benchmark suite": external eval phrases (fixed, version them in
#: production). 5-gram phrases so each contributes exactly one shingle.
BENCH_PHRASES = (
    "key agg row scan slow",
    "value table part a row",
    "the line sort table window",
    "merge batch part value fast",
    "spark a a the line",
    "fast table value part hash",
)


def contamination_external_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus overlap against an EXTERNAL benchmark phrase set.

    The production decontamination shape (vs the in-corpus variant
    ``contamination_ngram_check``): the benchmark suite is small
    relative to the corpus, so its shingle hashes become a BROADCAST
    relation and the corpus side joins map-side — one scan, a
    BroadcastHashJoin that only contaminated (doc, shingle) rows
    survive, then two source-keyed rollups over row counts. Nothing
    about the plan depends on benchmark cardinality (an earlier
    version inlined the hashes as a SQL literal array, which works for
    a fixture but makes plan size linear in the benchmark — a real
    decontamination suite has millions of n-grams). Per source:
    documents hit, total distinct-shingle hits, hit rate. In
    production the phrase relation is a versioned table read via
    ``load_source``; here it is built from the fixture tuple.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    phrases = spark.createDataFrame(
        [(p,) for p in BENCH_PHRASES], "phrase string"
    )
    bench = phrases.selectExpr(
        f"explode({th.shingle_hashes('phrase', CONTAM_N, 'spark')}) AS h"
    ).distinct()
    # array_distinct BEFORE the explode dedups shingles within a doc on
    # the map side (matching array_intersect's distinct semantics), so
    # post-join `count(*)` is sum-of-k and `count(distinct doc_id)` is
    # docs-hit — both aggregations see only contaminated rows.
    sh = docs.selectExpr(
        "doc_id",
        "source",
        "explode(array_distinct("
        f"{th.shingle_hashes('text', CONTAM_N, 'spark')})) AS h",
    )
    hit_agg = (
        sh.join(F.broadcast(bench), "h")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("docs_contaminated"),
            F.count(F.lit(1)).alias("ngram_hits"),
        )
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(hit_agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("docs_contaminated", F.lit(0)).alias(
                "docs_contaminated"
            ),
            F.coalesce("ngram_hits", F.lit(0)).alias("ngram_hits"),
            (
                F.coalesce("docs_contaminated", F.lit(0)).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("doc_hit_rate"),
        )
    )


def _oracle_external_bench() -> str:
    phr = ", ".join(f"('{p}')" for p in BENCH_PHRASES)
    return f"""
WITH phrases(phrase) AS (VALUES {phr}),
bench AS (
  SELECT DISTINCT unnest({th.shingle_hashes('phrase', CONTAM_N, 'duck')}) AS h
  FROM phrases),
benchlist AS (SELECT list(h) AS bh FROM bench),
per_doc AS (
  SELECT source,
         len(list_intersect(
           {th.shingle_hashes('text', CONTAM_N, 'duck')}, bh)) AS k
  FROM documents, benchlist)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_contaminated,
       CAST(SUM(k) AS BIGINT) AS ngram_hits,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS doc_hit_rate
FROM per_doc
GROUP BY source
"""


ORACLE_EXTERNAL_BENCH = _oracle_external_bench()


ORACLE_CONTAMINATION = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, source, h
  FROM (SELECT doc_id, source,
               unnest({th.shingle_hashes('text', CONTAM_N, 'duck')}) AS h
        FROM documents)
),
bench AS (SELECT DISTINCT h FROM sh
          WHERE source IN {_sql_in(BENCH_SOURCES)}),
cand AS (SELECT * FROM sh WHERE source NOT IN {_sql_in(BENCH_SOURCES)}),
sz AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM cand GROUP BY doc_id),
hits AS (SELECT doc_id, COUNT(*) AS k FROM cand
         WHERE h IN (SELECT h FROM bench) GROUP BY doc_id)
SELECT sz.doc_id, n_ngrams,
       COALESCE(k, 0) AS n_contaminated,
       CAST(COALESCE(k, 0) AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
         AS contamination_rate
FROM sz LEFT JOIN hits ON sz.doc_id = hits.doc_id
"""


# ---------------------------------------------------------------------------
# 2. stratified sampling — per-language hash-deterministic rates
# ---------------------------------------------------------------------------

#: basis-point sampling rate per language stratum
STRATA_BP = {"en": 5000, "es": 2500, "de": 2500, "fr": 1000, "zh": 1000}


def _bucket(expr: str, dialect: str, salt: str = "") -> str:
    """Deterministic 0..9999 bucket from a key expression (portable).

    The raw polyhash of short keys ('strat123') stays in a narrow
    band — too few fold steps wrap the modulus — so an affine rehash
    ``(a*h + b) % P`` scatters it before the bucket reduction (same
    trick as the MinHash permutations; max intermediate ~1e18 < 2^63).
    """
    keyed = (
        f"concat('{salt}', CAST({expr} AS STRING))"
        if dialect == "spark"
        else f"concat('{salt}', CAST({expr} AS VARCHAR))"
    )
    a, b = th.perm_coeffs(7)
    return f"(({a} * ({th.polyhash(keyed, dialect)}) + {b}) % {th.P}) % 10000"


def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample; per-stratum acceptance stats.

    ``df.sample``/``sampleBy`` are seed-dependent AND
    partitioning-dependent; a hash predicate on the stable key is the
    reproducible idiom (same doc set on every run, every cluster
    layout, and in the oracle engine).
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.create_map(
        *[F.lit(x) for kv in STRATA_BP.items() for x in kv]
    )
    sampled = docs.withColumn(
        "bucket", F.expr(_bucket("doc_id", "spark", "strat"))
    ).filter(F.col("bucket") < rate[F.col("lang")])
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
    )


_SQL_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_BP.items())
    + " ELSE 0 END"
)

ORACLE_STRATIFIED = f"""
SELECT lang, COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE {_bucket('doc_id', 'duck', 'strat')} < {_SQL_RATE_CASE}
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# 2b. train/val/test split — hash-deterministic 3-way assignment
# ---------------------------------------------------------------------------

#: basis-point split boundaries: [0,9000) train, [9000,9500) val, rest test
SPLIT_TRAIN_BP = 9000
SPLIT_VAL_BP = 9500

_SPLIT_CASE = (
    f"CASE WHEN bucket < {SPLIT_TRAIN_BP} THEN 'train'"
    f" WHEN bucket < {SPLIT_VAL_BP} THEN 'val' ELSE 'test' END"
)


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split with per-(lang, split) accounting.

    The same hash-bucket predicate as the stratified sampler
    (independent salt): assignment is a pure function of doc_id, so
    the split is identical on every run, every cluster layout, and in
    the oracle engine — the property that keeps eval sets from
    leaking into training when the corpus is re-processed.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", F.expr(_bucket("doc_id", "spark", "split")))
        .selectExpr("lang", "n_chars", f"{_SPLIT_CASE} AS split")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


ORACLE_SPLIT = f"""
WITH assigned AS (
  SELECT lang, n_chars,
         {_bucket('doc_id', 'duck', 'split')} AS bucket
  FROM documents)
SELECT lang, {_SPLIT_CASE} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM assigned
GROUP BY lang, {_SPLIT_CASE}
"""


# ---------------------------------------------------------------------------
# 3. domain mixing — hit target language weights from skewed counts
# ---------------------------------------------------------------------------

#: target mixture weights (basis points, sum 10000) and output budget
MIX_WEIGHTS_BP = {"en": 3000, "es": 2000, "de": 2000, "fr": 1500, "zh": 1500}
MIX_BUDGET = 200


def mix_domains_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the corpus toward target per-language weights.

    Two-pass: count per stratum, derive acceptance rate
    ``min(1, want/have)``, then the same hash-bucket predicate as the
    stratified sampler (independent salt). Returns per-language
    take/have/want so the mixing error is visible.
    """
    docs = load_table(spark, sf_dir, "documents")
    have = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("have"))
    # a lang absent from the weight table gets want=0 (take nothing),
    # NOT a NULL lookup: Spark's least() IGNORES NULLs, so a NULL want
    # would silently turn into rate 1.0 and sample the whole stratum —
    # the oracle's CASE ... ELSE 0 pins the zero semantics.
    want = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in MIX_WEIGHTS_BP.items() for x in kv]
        )[F.col("lang")],
        F.lit(0),
    ) * F.lit(MIX_BUDGET) / F.lit(10000.0)
    rates = have.select(
        "lang",
        "have",
        F.floor(
            F.least(F.lit(1.0), want / F.col("have").cast("double")) * 10000
        ).alias("thresh_bp"),
        want.alias("want"),
    )
    taken = (
        docs.withColumn("bucket", F.expr(_bucket("doc_id", "spark", "mix")))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("bucket") < F.col("thresh_bp"))
    )
    return taken.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_taken"),
        F.first("have").alias("n_have"),
        F.first("want").alias("n_want"),
    )


_SQL_WANT_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS_BP.items())
    + f" ELSE 0 END * {MIX_BUDGET} / 10000.0"
)

ORACLE_MIX_DOMAINS = f"""
WITH rates AS (
  SELECT lang, COUNT(*) AS have,
         FLOOR(LEAST(1.0, ({_SQL_WANT_CASE})
                          / CAST(COUNT(*) AS DOUBLE)) * 10000) AS thresh_bp,
         ({_SQL_WANT_CASE}) AS want
  FROM documents GROUP BY lang
)
SELECT d.lang, COUNT(*) AS n_taken,
       MIN(have) AS n_have, MIN(want) AS n_want
FROM documents d JOIN rates USING (lang)
WHERE {_bucket('doc_id', 'duck', 'mix')} < thresh_bp
GROUP BY d.lang
"""


def mix_domains_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-T=2 domain mixing: target share ∝ sqrt(count).

    The multilingual-sampling transform (Conneau & Lample-style
    p_l ∝ n_l^(1/T)) at T=2, where the exponent is sqrt — IEEE-
    correctly-rounded in BOTH engines, unlike libm pow(), which is why
    this spec pins T=2 rather than a free parameter. Up-weights tail
    languages relative to raw proportions without explicit weights
    (the curated-weights sibling is ``mix_domains_weighted``). Each
    sqrt is rounded through DECIMAL(28,9) so the normalizing sum is
    exact and order-free; share, target and the hash-bucket acceptance
    threshold are then single deterministic double ops.

    Scale posture: identical to the weighted mixer — one count pass,
    a broadcast of per-language rates, one filtered scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    have = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("have"))
    w = have.selectExpr(
        "lang",
        "have",
        "CAST(sqrt(CAST(have AS DOUBLE)) AS DECIMAL(28,9)) AS w",
    )
    tot = w.agg(F.sum("w").alias("w_sum"))
    rates = w.join(F.broadcast(tot)).selectExpr(
        "lang",
        "have",
        "CAST(w AS DOUBLE) / CAST(w_sum AS DOUBLE) AS share",
    ).selectExpr(
        "lang",
        "have",
        "share",
        f"floor(share * {MIX_BUDGET}) AS n_target",
    ).selectExpr(
        "lang",
        "have",
        "share",
        "n_target",
        "floor(least(1.0, CAST(n_target AS DOUBLE)"
        " / CAST(have AS DOUBLE)) * 10000) AS thresh_bp",
    )
    taken = (
        docs.withColumn("bucket", F.expr(_bucket("doc_id", "spark", "mixT")))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("bucket") < F.col("thresh_bp"))
    )
    return taken.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_taken"),
        F.first("have").alias("n_have"),
        F.first("share").alias("share"),
        F.first("n_target").cast("bigint").alias("n_target"),
    )


ORACLE_MIX_TEMPERATURE = f"""
WITH have AS (
  SELECT lang, COUNT(*) AS have FROM documents GROUP BY lang),
w AS (
  SELECT lang, have,
         CAST(sqrt(CAST(have AS DOUBLE)) AS DECIMAL(28,9)) AS w
  FROM have),
tot AS (SELECT CAST(SUM(w) AS DECIMAL(38,9)) AS w_sum FROM w),
rates AS (
  SELECT lang, have,
         CAST(w AS DOUBLE) / CAST(w_sum AS DOUBLE) AS share,
         floor(CAST(w AS DOUBLE) / CAST(w_sum AS DOUBLE)
               * {MIX_BUDGET}) AS n_target,
         floor(least(1.0, CAST(floor(CAST(w AS DOUBLE)
               / CAST(w_sum AS DOUBLE) * {MIX_BUDGET}) AS DOUBLE)
               / CAST(have AS DOUBLE)) * 10000) AS thresh_bp
  FROM w, tot)
SELECT d.lang,
       COUNT(*) AS n_taken,
       MIN(have) AS n_have,
       MIN(share) AS share,
       CAST(MIN(n_target) AS BIGINT) AS n_target
FROM documents d JOIN rates USING (lang)
WHERE {_bucket('doc_id', 'duck', 'mixT')} < thresh_bp
GROUP BY d.lang
"""


# ---------------------------------------------------------------------------
# 4. PII redaction — regex scrub with per-segment audit counts
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_LONG_ID_RE = "[0-9]{4,}"


def pii_redact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails then long numeric IDs; audit counts per segment.

    The corpus tables carry no PII, so the operator demonstrates the
    scrub on a deterministic contact-note column derived from
    ``customer`` (same construction in the oracle). Redaction order
    matters — emails first, or the ID pass would eat the digits inside
    the address — and the counts come from ``regexp_extract_all`` on
    the same intermediate the replacement saw.
    """
    cust = load_table(spark, sf_dir, "customer")
    notes = F.concat(
        F.lit("contact "),
        F.lower(F.regexp_replace(F.col("c_name"), "#", ".")),
        F.lit("@corp.example ref "),
        (F.col("c_custkey") * 7919).cast("string"),
        F.lit(" thanks"),
    )
    with_notes = cust.withColumn("notes", notes)
    no_email = F.regexp_replace(F.col("notes"), _EMAIL_RE, "<EMAIL>")
    step1 = with_notes.select(
        "c_mktsegment",
        F.size(F.expr(f"regexp_extract_all(notes, '{_EMAIL_RE}', 0)")).alias(
            "n_emails"
        ),
        no_email.alias("t1"),
    )
    return (
        step1.select(
            "c_mktsegment",
            "n_emails",
            F.size(
                F.expr(f"regexp_extract_all(t1, '{_LONG_ID_RE}', 0)")
            ).alias("n_ids"),
            F.regexp_replace(F.col("t1"), _LONG_ID_RE, "<ID>").alias("clean"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_emails").alias("emails_redacted"),
            F.sum("n_ids").alias("ids_redacted"),
            F.countDistinct("clean").alias("n_distinct_clean"),
        )
    )


ORACLE_PII_REDACT = f"""
WITH noted AS (
  SELECT c_mktsegment,
         'contact ' || lower(replace(c_name, '#', '.'))
           || '@corp.example ref ' || CAST(c_custkey * 7919 AS VARCHAR)
           || ' thanks' AS notes
  FROM customer
),
step1 AS (
  SELECT c_mktsegment,
         len(regexp_extract_all(notes, '{_EMAIL_RE}')) AS n_emails,
         regexp_replace(notes, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM noted
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
       CAST(SUM(len(regexp_extract_all(t1, '{_LONG_ID_RE}'))) AS BIGINT)
         AS ids_redacted,
       COUNT(DISTINCT regexp_replace(t1, '{_LONG_ID_RE}', '<ID>', 'g'))
         AS n_distinct_clean
FROM step1
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# 5. sequence packing — concat-and-chunk + hierarchical greedy, both on
#    two-phase distributed prefix sums (no per-source window task)
# ---------------------------------------------------------------------------

PACK_BUDGET = 256

#: fixed bucket width (order-units per bucket) for the two-phase
#: prefix sum — in-bucket tasks are bounded by ≤ this many distinct
#: order values no matter how skewed the partitions are. At 100 TB
#: tune it so one bucket's rows fit an executor; the plan shape is
#: unchanged.
PREFIX_BUCKET_WIDTH = 4096


def _with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.size(F.expr(th.words("text", "spark"))).alias("n_tokens"),
    )


def two_phase_prefix_sum(
    df: DataFrame,
    part: str,
    order: str,
    val: str,
    out: str,
    bucket_width: int = PREFIX_BUCKET_WIDTH,
) -> DataFrame:
    """EXCLUSIVE per-``part`` running sum of ``val`` in ``order`` order,
    as a distributed two-phase scan instead of one window task per
    partition value.

    ``sum(val) OVER (PARTITION BY part ORDER BY order)`` puts an entire
    partition in ONE window task — with few, huge partitions (one
    corpus source holding TBs) that task is the whole job (VERDICT r4
    items 1/2). The standard distributed scan instead:

    1. bucket rows by ``order div bucket_width`` — a fixed-width,
       order-monotone integer map (truncating div is monotone, so
       cross-bucket order == ``order`` order; ``order`` must be
       integral). No bounds pass, and no task ever sees more than
       ``bucket_width`` distinct order values, however skewed the
       partitions are;
    2. bucket totals via a NARROW groupBy branch — map-side partial
       aggregation means only one row per non-empty bucket is
       shuffled; the branch re-reads the (column-pruned) input but
       never shuffles it. Totals are prefix-summed into per-bucket
       offsets; the per-``part`` window here sorts only the bucket
       relation, n/bucket_width rows at worst;
    3. ONE full-data shuffle on (part, bucket): in-bucket exclusive
       prefix sums via a window whose sort is bucket-bounded;
       ``out`` = broadcast-joined offset + in-bucket prefix.

    Cost model vs the single window: the input's value computation
    runs twice (once in the narrow totals branch, once in the main
    branch — both embarrassingly parallel), in exchange for removing
    the per-partition sequential scan entirely. The offsets relation
    is broadcast — it shrinks the data by ×bucket_width; if a single
    partition ever yields too many buckets to broadcast, widen
    ``bucket_width`` or apply the same scan recursively to the bucket
    relation.
    """
    from pyspark.sql.window import Window

    bkt = F.expr(f"{order} div {int(bucket_width)}")
    tot = (
        df.select(F.col(part), bkt.alias("__bkt"), F.col(val))
        .groupBy(part, "__bkt")
        .agg(F.sum(val).alias("__bsum"))
    )
    w_off = (
        Window.partitionBy(part)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tot.select(
        part,
        "__bkt",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__boff"),
    )
    w_in = (
        Window.partitionBy(part, "__bkt")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__bkt", bkt)
        .withColumn("__in", F.coalesce(F.sum(val).over(w_in), F.lit(0)))
        .join(F.broadcast(offs), [part, "__bkt"])
        .withColumn(out, F.col("__boff") + F.col("__in"))
        .drop("__bkt", "__in", "__boff")
    )


def pack_sequences_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: fixed token boundaries per source.

    The GPT-style packing strategy — concatenate the stream in stable
    (doc_id) order and split every ``PACK_BUDGET`` tokens; a document
    belongs to the chunk where it starts. The token-position prefix
    sum runs as the two-phase distributed scan
    (``two_phase_prefix_sum``) — no single task ever holds a whole
    source. No state, no UDF.
    """
    toks = _with_tokens(spark, sf_dir)
    return (
        two_phase_prefix_sum(toks, "source", "doc_id", "n_tokens", "start")
        .withColumn("chunk_id", F.floor(F.col("start") / PACK_BUDGET))
        .groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
        )
    )


ORACLE_PACK_CHUNKED = f"""
WITH toks AS (
  SELECT doc_id, source,
         len({th.words('text', 'duck')}) AS n_tokens
  FROM documents
),
placed AS (
  SELECT source,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start,
         n_tokens
  FROM toks
)
SELECT source, CAST(FLOOR(start / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM placed
GROUP BY source, FLOOR(start / {PACK_BUDGET})
"""


#: shard capacity for the hierarchical greedy pack: ~32 bins of work
#: per shard keeps the JVM aggregate-lambda state tiny while leaving
#: enough docs per shard that the boundary underfill is negligible
PACK_SHARD_BUDGET = 32 * PACK_BUDGET


def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy whole-document packing, hierarchical (shard-local reset).

    A running fill-with-reset is not a window function, and a single
    per-source sequential scan is exactly the thing that cannot scale
    (one task holds the whole source). So the contract is the standard
    distributed-packing one: documents are sharded by their prefix-sum
    token position into capacity-bounded shards
    (``PACK_SHARD_BUDGET`` = 32 bins' worth), greedy packing runs
    independently inside each shard (fill resets at shard boundaries —
    at most one underfilled bin per shard, a <1/32 packing-efficiency
    cost), and shard-local bin ids are stitched into global ones by a
    bins-per-shard prefix sum over the tiny one-row-per-shard table.

    Per-shard greedy runs as a JVM ``aggregate`` lambda over the
    shard's sorted (doc_id, n_tokens) structs — no Python workers on
    this path at all (the prior ``applyInPandas`` form grouped by raw
    ``source``, which is both unbounded state at 100 TB and ~5 s of
    one-time Python-worker spin-up in a fresh session). A document
    larger than the budget still gets a bin of its own. The oracle
    replays the same shard-local scan as a DuckDB recursive CTE.
    """
    return greedy_pack(_with_tokens(spark, sf_dir))


def greedy_pack(toks: DataFrame) -> DataFrame:
    """Hierarchical greedy pack over (doc_id, source, n_tokens) rows —
    the shard/pack/stitch plan documented on ``pack_sequences_greedy``.
    Factored out so tests can drive it with synthetic skewed sources.
    The shard-id derivation (token-position prefix sum) and the
    bins-per-shard stitch both run as two-phase distributed scans —
    no window task ever holds a whole source (the r4 critique applied
    one level down: the shard ids were themselves derived by a
    per-source sequential window).
    """
    sharded = two_phase_prefix_sum(
        toks, "source", "doc_id", "n_tokens", "start"
    ).withColumn(
        "shard_id", F.floor(F.col("start") / PACK_SHARD_BUDGET)
    )
    packed = (
        sharded.groupBy("source", "shard_id")
        .agg(
            F.expr(
                "sort_array(collect_list(struct(doc_id, n_tokens))) AS docs"
            )
        )
        .selectExpr(
            "source",
            "shard_id",
            "docs",
            f"""aggregate(
                  docs,
                  named_struct('bin', CAST(0 AS BIGINT),
                               'fill', CAST(0 AS BIGINT),
                               'assign', CAST(array() AS ARRAY<BIGINT>)),
                  (acc, d) -> CASE
                    WHEN acc.fill > 0 AND acc.fill + d.n_tokens > {PACK_BUDGET}
                    THEN named_struct('bin', acc.bin + 1,
                                      'fill', CAST(d.n_tokens AS BIGINT),
                                      'assign',
                                      concat(acc.assign, array(acc.bin + 1)))
                    ELSE named_struct('bin', acc.bin,
                                      'fill', acc.fill + d.n_tokens,
                                      'assign',
                                      concat(acc.assign, array(acc.bin)))
                  END,
                  acc -> acc.assign) AS assign""",
        )
        .selectExpr(
            "source",
            "shard_id",
            "docs",
            "assign",
            "element_at(assign, -1) + 1 AS n_bins",
        )
    )
    # bins-per-shard prefix sum over the one-row-per-shard table —
    # computed BEFORE the explode so no self-join/recompute is needed.
    # Also two-phase: at 100 TB a 1-TB source still has ~30 M shard
    # rows, too many for one window task.
    return (
        two_phase_prefix_sum(packed, "source", "shard_id", "n_bins", "base")
        .selectExpr(
            "source", "base", "explode(arrays_zip(docs, assign)) AS z"
        )
        .selectExpr(
            "source",
            "base + z.assign AS bin_id",
            "z.docs.n_tokens AS n_tokens",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


ORACLE_PACK_GREEDY = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source,
         len({th.words('text', 'duck')}) AS n_tokens
  FROM documents
),
placed AS MATERIALIZED (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {PACK_SHARD_BUDGET}) AS BIGINT) AS shard_id
  FROM toks
),
sharded AS MATERIALIZED (
  SELECT source, shard_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source, shard_id
                            ORDER BY doc_id) AS rn
  FROM placed
),
walk AS (
  SELECT source, shard_id, rn, n_tokens, 0 AS bin_local,
         n_tokens AS fill
  FROM sharded WHERE rn = 1
  UNION ALL
  SELECT t.source, t.shard_id, t.rn, t.n_tokens,
         CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > {PACK_BUDGET}
              THEN w.bin_local + 1 ELSE w.bin_local END,
         CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > {PACK_BUDGET}
              THEN t.n_tokens ELSE w.fill + t.n_tokens END
  FROM walk w JOIN sharded t
    ON t.source = w.source AND t.shard_id = w.shard_id
   AND t.rn = w.rn + 1
),
shard_bins AS (
  SELECT source, shard_id, MAX(bin_local) + 1 AS n_bins
  FROM walk GROUP BY source, shard_id
),
based AS (
  SELECT source, shard_id,
         COALESCE(SUM(n_bins) OVER (
           PARTITION BY source ORDER BY shard_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
  FROM shard_bins
)
SELECT w.source, CAST(b.base + w.bin_local AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(w.n_tokens) AS BIGINT) AS bin_tokens
FROM walk w JOIN based b
  ON w.source = b.source AND w.shard_id = b.shard_id
GROUP BY w.source, b.base + w.bin_local
"""


# ---------------------------------------------------------------------------
# 6. sliding-window chunking — overlapping fixed windows (RAG/context
#    chunking: window W, stride S, last chunk may be short)
# ---------------------------------------------------------------------------

CHUNK_W = 128
CHUNK_S = 96


def chunk_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token windows per document (W=128, S=96).

    The retrieval/context-extension chunker: chunk *k* covers tokens
    ``[k*S, k*S + W)``; chunks start while tokens remain, so the tail
    chunk may be short and consecutive chunks overlap by ``W - S``.
    Pure per-row ``sequence`` + ``explode`` — no shuffle at all until
    a consumer aggregates; at 100 TB this is a map-only stage whose
    fan-out (≈ n_tokens/S rows per doc) is bounded per task by the
    input split size.
    """
    toks = _with_tokens(spark, sf_dir).filter(F.col("n_tokens") > 0)
    n_chunks = f"CAST(FLOOR((n_tokens + {CHUNK_S - 1}) / {CHUNK_S}.0) AS INT)"
    return (
        toks.selectExpr(
            "doc_id",
            "source",
            "n_tokens",
            f"explode(sequence(0, {n_chunks} - 1)) AS chunk_id",
        )
        .selectExpr(
            "doc_id",
            "source",
            "CAST(chunk_id AS BIGINT) AS chunk_id",
            f"CAST(chunk_id * {CHUNK_S} AS BIGINT) AS start_token",
            f"CAST(LEAST({CHUNK_W}, n_tokens - chunk_id * {CHUNK_S})"
            " AS BIGINT) AS chunk_tokens",
        )
    )


ORACLE_CHUNK_SLIDING = f"""
WITH toks AS (
  SELECT doc_id, source, len({th.words('text', 'duck')}) AS n_tokens
  FROM documents),
fan AS (
  SELECT doc_id, source, n_tokens,
         unnest(generate_series(0,
           CAST(FLOOR((n_tokens + {CHUNK_S - 1}) / {CHUNK_S}.0) AS INT) - 1))
           AS chunk_id
  FROM toks WHERE n_tokens > 0)
SELECT doc_id, source,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {CHUNK_S} AS BIGINT) AS start_token,
       CAST(LEAST({CHUNK_W}, n_tokens - chunk_id * {CHUNK_S}) AS BIGINT)
         AS chunk_tokens
FROM fan
"""


# ---------------------------------------------------------------------------
# cross-document boilerplate chunk filter (CCNet-style paragraph dedup)
# ---------------------------------------------------------------------------

#: words per non-overlapping chunk ("paragraph" unit on the
#: single-line synthetic corpus) and the document-frequency threshold
#: above which a chunk is boilerplate.
BOILER_W = 10
BOILER_K = 3


def boilerplate_chunk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal accounting, per source.

    The CCNet/RefinedWeb curation primitive: a paragraph that repeats
    across many *distinct* documents (headers, footers, license
    blurbs) is boilerplate and is dropped from every document. On this
    corpus (single-line texts) the paragraph unit is the
    non-overlapping ``BOILER_W``-word chunk; a chunk whose hash occurs
    in >= ``BOILER_K`` distinct docs is flagged, and the output is the
    per-source removal audit a pipeline run would log: docs touched,
    chunks flagged, share of chunks removed.

    Shape (100 TB): the text is hashed exactly once (map-only explode
    of the persisted chunk relation); the document-frequency
    aggregation and the flag join-back both shuffle only compact
    ``(h: int64, doc_id)`` rows, never text — the same two-shuffle
    profile as the contamination family. Chunk hashes are uniform, so
    neither shuffle has skew; at 100 TB the df-table is the artifact
    you materialize once per corpus snapshot.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    rows = docs.selectExpr(
        "doc_id",
        "source",
        f"{th.chunk_hashes('text', BOILER_W, 'spark')} AS hs",
    ).select("doc_id", "source", F.explode("hs").alias("h"))
    freq = rows.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )
    flagged = rows.join(freq, "h").withColumn(
        "b", F.when(F.col("df_docs") >= BOILER_K, 1).otherwise(0)
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_ch"),
        F.sum("b").alias("n_b"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ch").alias("total_chunks"),
        F.sum("n_b").alias("boiler_chunks"),
        F.sum(F.when(F.col("n_b") > 0, 1).otherwise(0)).alias(
            "docs_affected"
        ),
        (
            F.sum("n_b").cast("double")
            / F.sum("n_ch").cast("double")
        ).alias("boiler_chunk_share"),
    )


ORACLE_BOILERPLATE = f"""
WITH rows AS (
  SELECT doc_id, source,
         unnest({th.chunk_hashes('text', BOILER_W, 'duck')}) AS h
  FROM documents),
freq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS df_docs FROM rows GROUP BY h),
flagged AS (
  SELECT r.doc_id, r.source,
         CASE WHEN f.df_docs >= {BOILER_K} THEN 1 ELSE 0 END AS b
  FROM rows r JOIN freq f USING (h)),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_ch, SUM(b) AS n_b
  FROM flagged GROUP BY doc_id, source)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_ch) AS BIGINT) AS total_chunks,
       CAST(SUM(n_b) AS BIGINT) AS boiler_chunks,
       CAST(SUM(CASE WHEN n_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(SUM(n_b) AS DOUBLE) / CAST(SUM(n_ch) AS DOUBLE)
         AS boiler_chunk_share
FROM per_doc GROUP BY source
"""


# ---------------------------------------------------------------------------
# 8. DSIR-style importance selection — hashed-unigram importance weights
# ---------------------------------------------------------------------------

#: hashing-trick feature space (buckets) and selection budget
DSIR_B = 1024
DSIR_K = 100


def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

    Selects the ``DSIR_K`` raw-pool documents whose hashed-unigram
    distribution best matches a target domain. Target = the benchmark
    sources (``BENCH_SOURCES``); raw pool = every other source. Each
    word hashes into one of ``DSIR_B`` buckets (hashing trick); the
    per-document log importance weight is

        sum over tokens of  ln P_tgt(b) - ln P_src(b)

    with add-one smoothing, P(b) = (c(b)+1)/(N+B). Determinism: the
    per-bucket term is ONE ``ln`` over a ratio of two exact BIGINT
    products ((c_tgt+1)*(N_src+B)) / ((c_src+1)*(N_tgt+B)) — exact in
    IEEE double while both products stay under 2^53 (N ~ 5e7 tokens at
    sf10; a 100-TB run would split the ln into two rounded terms) —
    rounded through DECIMAL(28,9), then summed exactly as a decimal
    weighted by the in-doc bucket count (the ``text_bigram_logprob``
    recipe). Ties broken by doc_id, so top-K is total-ordered.

    Shape (100 TB): ONE shuffle builds the (doc, bucket, count)
    relation; both corpus bucket tables group to <= ``DSIR_B`` rows and
    broadcast (the target/source LMs are dictionary-sized by
    construction — that is the point of the hashing trick); totals ride
    1-row broadcast relations; scoring is map-side; the final top-K is
    TakeOrdered (no global sort shuffle). Docs with zero alphanumeric
    tokens have no evidence and are absent, as in the LM-scoring specs.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    src_set = ", ".join(f"'{s}'" for s in BENCH_SOURCES)
    toks = docs.selectExpr(
        "doc_id",
        "lang",
        "source",
        f"source IN ({src_set}) AS is_tgt",
        f"transform({th.word_hashes('text', 'spark')},"
        f" wh -> wh % {DSIR_B}) AS bs",
    ).select(
        "doc_id", "lang", "source", "is_tgt", F.explode("bs").alias("b")
    )
    pool = toks.filter(~F.col("is_tgt"))
    doc_b = pool.groupBy("doc_id", "lang", "source", "b").agg(
        F.count(F.lit(1)).alias("c_doc")
    )
    tgt_b = F.broadcast(
        toks.filter("is_tgt").groupBy("b").agg(
            F.count(F.lit(1)).alias("c_tgt")
        )
    )
    src_b = F.broadcast(
        pool.groupBy("b").agg(F.count(F.lit(1)).alias("c_src"))
    )
    n_tgt = F.broadcast(
        toks.filter("is_tgt").agg(F.count(F.lit(1)).alias("__nt"))
    )
    n_src = F.broadcast(pool.agg(F.count(F.lit(1)).alias("__ns")))
    scored = (
        doc_b.join(tgt_b, "b", "left")
        .join(src_b, "b")  # every pool bucket exists in src by def.
        .crossJoin(n_tgt)
        .crossJoin(n_src)
        .selectExpr(
            "doc_id",
            "lang",
            "source",
            "c_doc",
            "CAST(ln("
            f" CAST((coalesce(c_tgt, 0) + 1) * (__ns + {DSIR_B})"
            "      AS DOUBLE)"
            f" / CAST((c_src + 1) * (__nt + {DSIR_B}) AS DOUBLE)"
            ") AS DECIMAL(28,9)) AS lw",
        )
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("c_doc").alias("n_tokens"),
            F.expr("SUM(lw * CAST(c_doc AS DECIMAL(9,0)))").alias(
                "lw_sum"
            ),
        )
    )
    return (
        scored.orderBy(F.col("lw_sum").desc(), F.col("doc_id"))
        .limit(DSIR_K)
        .selectExpr(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "CAST(lw_sum AS DOUBLE) AS logweight",
        )
    )


def _oracle_dsir() -> str:
    src_set = ", ".join(f"'{s}'" for s in BENCH_SOURCES)
    return f"""
WITH toks AS (
  SELECT doc_id, lang, source, source IN ({src_set}) AS is_tgt,
         unnest(list_transform({th.word_hashes('text', 'duck')},
                               wh -> wh % {DSIR_B})) AS b
  FROM documents),
doc_b AS (
  SELECT doc_id, lang, source, b, COUNT(*) AS c_doc
  FROM toks WHERE NOT is_tgt GROUP BY ALL),
tgt_b AS (SELECT b, COUNT(*) AS c_tgt FROM toks WHERE is_tgt GROUP BY b),
src_b AS (
  SELECT b, COUNT(*) AS c_src FROM toks WHERE NOT is_tgt GROUP BY b),
scored AS (
  SELECT doc_id, lang, source, c_doc,
         CAST(ln(
           CAST((COALESCE(c_tgt, 0) + 1)
                * ((SELECT COUNT(*) FROM toks WHERE NOT is_tgt)
                   + {DSIR_B}) AS DOUBLE)
           / CAST((c_src + 1)
                  * ((SELECT COUNT(*) FROM toks WHERE is_tgt)
                     + {DSIR_B}) AS DOUBLE))
              AS DECIMAL(28,9)) AS lw
  FROM doc_b LEFT JOIN tgt_b USING (b) JOIN src_b USING (b)),
agg AS (
  SELECT doc_id, lang, source,
         CAST(SUM(c_doc) AS BIGINT) AS n_tokens,
         CAST(SUM(lw * CAST(c_doc AS DECIMAL(9,0)))
              AS DECIMAL(38,9)) AS lw_sum
  FROM scored GROUP BY doc_id, lang, source)
SELECT doc_id, lang, source, n_tokens,
       CAST(lw_sum AS DOUBLE) AS logweight
FROM agg ORDER BY lw_sum DESC, doc_id LIMIT {DSIR_K}
"""


ORACLE_DSIR = _oracle_dsir()


# ---------------------------------------------------------------------------
# 8b. token-budget selection — keep the best docs within a per-language
#     token budget, WITHOUT a global sort
# ---------------------------------------------------------------------------

#: per-language token budget for the selection audit
BUDGET_TOKENS = 10_000


def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality docs per language within a token budget.

    The budget-cut every curation run ends with: rank documents by a
    quality key (here the distinct-token permille, an exact integer),
    keep the best until the language's token budget is exhausted.
    Selection rule: order by (q DESC, doc_id ASC), keep the strict
    PREFIX that fits — stop at the first doc that would overflow
    ``BUDGET_TOKENS`` (no greedy skip-and-continue; running sums are
    monotone, so dropping the tail keeps the rule one window predicate).

    Scalable form — the naive per-language sort window puts a whole
    language in ONE task, unusable at 100 TB. Instead the plan is the
    histogram-threshold decomposition (same discipline as the packing
    family's ``two_phase_prefix_sum``):

    1. per-(lang, q) token histogram — <= 1001 rows per language;
    2. a tiny window over the HISTOGRAM finds the threshold bucket q*
       (every bucket above q* is kept whole, map-side);
    3. only the boundary bucket (lang, q*) runs a doc-level prefix sum,
       partitioned by (lang, q) — bounded by one quality bucket, not
       one language.

    Output: per language — docs/tokens kept vs total, the threshold
    quality, and the budget fill ratio.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.selectExpr(
        "doc_id",
        "lang",
        f"element_at(transform(array({th.words('text', 'spark')}),"
        " ws -> struct(size(ws) AS n_tok,"
        " size(array_distinct(ws)) AS n_dist)), 1) AS t",
    ).selectExpr(
        "doc_id",
        "lang",
        "t.n_tok AS n_tok",
        "CASE WHEN t.n_tok = 0 THEN CAST(0 AS BIGINT)"
        " ELSE CAST(t.n_dist AS BIGINT) * 1000 DIV t.n_tok END AS q",
    )
    from pyspark.sql.window import Window

    hist = base.groupBy("lang", "q").agg(
        F.sum("n_tok").alias("bucket_toks"),
        F.count(F.lit(1)).alias("bucket_docs"),
    )
    wh = (
        Window.partitionBy("lang")
        .orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist2 = hist.withColumn(
        "cum_before", F.coalesce(F.sum("bucket_toks").over(wh), F.lit(0))
    ).withColumn(
        "bucket_state",
        F.when(
            F.col("cum_before") + F.col("bucket_toks")
            <= F.lit(BUDGET_TOKENS),
            F.lit("full"),
        )
        .when(F.col("cum_before") < F.lit(BUDGET_TOKENS), F.lit("boundary"))
        .otherwise(F.lit("out")),
    )
    staged = base.join(
        F.broadcast(
            hist2.select("lang", "q", "bucket_state", "cum_before")
        ),
        ["lang", "q"],
    )
    wb = (
        Window.partitionBy("lang", "q")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept = staged.withColumn(
        "keep",
        F.when(F.col("bucket_state") == "full", F.lit(True)).when(
            (F.col("bucket_state") == "boundary")
            & (
                F.col("cum_before") + F.sum("n_tok").over(wb)
                <= F.lit(BUDGET_TOKENS)
            ),
            F.lit(True),
        ).otherwise(F.lit(False)),
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum(F.col("keep").cast("long")).alias("docs_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0)).alias(
            "tokens_kept"
        ),
        F.min(F.when(F.col("keep"), F.col("q"))).alias("q_threshold"),
    ).withColumn(
        "fill_ratio",
        F.col("tokens_kept").cast("double") / F.lit(float(BUDGET_TOKENS)),
    )


ORACLE_TOKEN_BUDGET = f"""
WITH base AS (
  SELECT doc_id, lang, len(ws) AS n_tok,
         CASE WHEN len(ws) = 0 THEN 0
              ELSE CAST(len(list_distinct(ws)) AS BIGINT) * 1000
                   // len(ws) END AS q
  FROM (SELECT doc_id, lang, {th.words('text', 'duck')} AS ws
        FROM documents)),
hist AS (
  SELECT lang, q, SUM(n_tok) AS bucket_toks
  FROM base GROUP BY lang, q),
hist2 AS (
  SELECT lang, q,
         COALESCE(SUM(bucket_toks) OVER (PARTITION BY lang ORDER BY q DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         bucket_toks
  FROM hist),
states AS (
  SELECT lang, q, cum_before,
         CASE WHEN cum_before + bucket_toks <= {BUDGET_TOKENS} THEN 'full'
              WHEN cum_before < {BUDGET_TOKENS} THEN 'boundary'
              ELSE 'out' END AS bucket_state
  FROM hist2),
kept AS (
  SELECT b.lang, b.n_tok, b.q,
         CASE WHEN s.bucket_state = 'full' THEN TRUE
              WHEN s.bucket_state = 'boundary'
                   AND s.cum_before + SUM(b.n_tok) OVER (
                         PARTITION BY b.lang, b.q ORDER BY b.doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       <= {BUDGET_TOKENS} THEN TRUE
              ELSE FALSE END AS keep
  FROM base b JOIN states s USING (lang, q))
SELECT lang,
       COUNT(*) AS docs_total,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
       CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_kept,
       MIN(CASE WHEN keep THEN q END) AS q_threshold,
       CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS DOUBLE)
         / {float(BUDGET_TOKENS)!r} AS fill_ratio
FROM kept GROUP BY lang
"""


# ---------------------------------------------------------------------------
# 9. end-to-end curation funnel — quality → dedup → decontam → sample
# ---------------------------------------------------------------------------

#: quality gates: minimum tokens, minimum distinct-token ratio (x1000)
CURATE_MIN_TOKENS = 10
CURATE_MIN_DISTINCT_PM = 300


def curate_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE lazy plan: per-language funnel.

    Chains the four standard corpus-curation stages, each applied to
    the survivors of the previous, and reports the per-language
    retention funnel a pipeline run logs:

    1. quality  — >= ``CURATE_MIN_TOKENS`` tokens AND distinct-token
       ratio >= ``CURATE_MIN_DISTINCT_PM``/1000 (integer cross-multiply,
       no float);
    2. dedup    — exact near-canonical dedup: keep the min doc_id per
       polyhash of the normalized (lower-alnum-joined) text, among
       quality survivors;
    3. decontam — drop docs whose normalized text contains any
       benchmark phrase (broadcast literal scan, ``BENCH_PHRASES``);
    4. sample   — the deterministic per-language hash-bucket rates of
       the stratified sampler (independent salt).

    Shape (100 TB): one projection computes every per-doc flag from a
    single ``words()`` evaluation (bound via LATERAL-style transform so
    the tokenizer runs once); the only shuffles are the dedup window
    (partitioned by the 8-byte text hash — arbitrary-cardinality safe)
    and the final per-language aggregate. Nothing materializes between
    stages; Catalyst sees the funnel as one tree and collapses the
    flag projections into the scan.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    phr = " OR ".join(
        f"contains(norm, '{p}')" for p in BENCH_PHRASES
    )
    flagged = docs.selectExpr(
        "doc_id",
        "lang",
        f"element_at(transform(array({th.words('text', 'spark')}),"
        " ws -> struct("
        f"  size(ws) AS n_tok,"
        f"  size(array_distinct(ws)) AS n_dist,"
        f"  concat_ws(' ', ws) AS norm)), 1) AS t",
    ).selectExpr(
        "doc_id",
        "lang",
        f"t.n_tok >= {CURATE_MIN_TOKENS} AND"
        f" t.n_dist * 1000 >= t.n_tok * {CURATE_MIN_DISTINCT_PM}"
        " AS q_ok",
        f"{th.polyhash('t.norm', 'spark')} AS norm_h",
        "t.norm AS norm",
    )
    from pyspark.sql.window import Window

    keeper = F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(
        Window.partitionBy("norm_h")
    )
    staged = flagged.withColumn(
        "d_ok", F.col("q_ok") & (F.col("doc_id") == keeper)
    ).selectExpr(
        "doc_id",
        "lang",
        "q_ok",
        "d_ok",
        f"d_ok AND NOT ({phr}) AS c_ok",
        f"d_ok AND NOT ({phr})"
        f" AND {_bucket('doc_id', 'spark', 'curate')}"
        f" < ({_SQL_RATE_CASE}) AS s_ok",
    )
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("q_ok").cast("long")).alias("n_quality"),
        F.sum(F.col("d_ok").cast("long")).alias("n_dedup"),
        F.sum(F.col("c_ok").cast("long")).alias("n_decontam"),
        F.sum(F.col("s_ok").cast("long")).alias("n_sampled"),
    )


def _oracle_curate() -> str:
    phr = " OR ".join(
        f"contains(norm, '{p}')" for p in BENCH_PHRASES
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, {th.words('text', 'duck')} AS ws FROM documents),
flagged AS (
  SELECT doc_id, lang,
         len(ws) >= {CURATE_MIN_TOKENS}
           AND len(list_distinct(ws)) * 1000
               >= len(ws) * {CURATE_MIN_DISTINCT_PM} AS q_ok,
         {th.polyhash("array_to_string(ws, ' ')", 'duck')} AS norm_h,
         array_to_string(ws, ' ') AS norm
  FROM base),
staged AS (
  SELECT doc_id, lang, q_ok,
         q_ok AND doc_id = MIN(CASE WHEN q_ok THEN doc_id END)
                             OVER (PARTITION BY norm_h) AS d_ok,
         norm
  FROM flagged),
final AS (
  SELECT doc_id, lang, q_ok, d_ok,
         d_ok AND NOT ({phr}) AS c_ok,
         d_ok AND NOT ({phr})
           AND {_bucket('doc_id', 'duck', 'curate')}
               < ({_SQL_RATE_CASE}) AS s_ok
  FROM staged)
SELECT lang, COUNT(*) AS n_raw,
       CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN d_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(SUM(CASE WHEN c_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_decontam,
       CAST(SUM(CASE WHEN s_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM final GROUP BY lang
"""


ORACLE_CURATE = _oracle_curate()


# ---------------------------------------------------------------------------
# Weighted sampling without replacement — Efraimidis–Spirakis priorities
# ---------------------------------------------------------------------------

#: sample size for the weighted-priority draw
ES_K = 100


def es_priority_key(
    key: str, weight: str, dialect: str, salt: str = "espri"
) -> str:
    """The E-S priority key ``-ln(u) / w`` as portable SQL text
    (exported via :mod:`..functions`).

    u is a deterministic hash-uniform in (0, 1]: affine-rehashed
    polyhash of the salted key, +1, divided by P+1 (ONE double
    division). The single ``ln`` is rounded through DECIMAL(28,9) —
    the established cross-engine libm recipe (see text.py LM scoring)
    — then one more IEEE division by the weight. Smallest key wins:
    this is the exponential-race formulation (item with weight w
    "arrives" at Exp(w) time), equivalent to Efraimidis–Spirakis
    u^(1/w) max-sampling but numerically tamer.
    """
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    keyed = f"concat('{salt}', CAST({key} AS {cast}))"
    a, b = th.perm_coeffs(11)
    h = f"(({a} * ({th.polyhash(keyed, dialect)}) + {b}) % {th.P})"
    u = f"(CAST(({h}) + 1 AS DOUBLE) / {float(th.P + 1)!r})"
    return (
        f"-CAST(CAST(ln({u}) AS DECIMAL(28,9)) AS DOUBLE)"
        f" / CAST({weight} AS DOUBLE)"
    )


def _es_key_exprs(dialect: str) -> str:
    return es_priority_key("doc_id", "n_chars", dialect)


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, k={ES_K}, weight = n_chars
    (longer documents proportionally likelier — the standard
    size-weighted corpus draw).

    Efraimidis & Spirakis 2006: assign every item the priority key
    ``-ln(u)/w`` with u uniform, keep the k smallest. The draw is a
    distributed one-pass top-k (map-side key + TakeOrdered partial
    top-k per partition, driver merges k·partitions candidates) — no
    global sort, no RNG state, rerun- and repartition-stable, and the
    same k items fall out of any engine that implements the hash.
    At 100 TB this is THE way to draw a weighted sample: ``rand()``
    breaks reproducibility and a weight-proportional global sort is a
    full shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter("n_chars > 0")
        .selectExpr(
            "doc_id",
            "lang",
            "n_chars",
            f"{_es_key_exprs('spark')} AS es_key",
        )
        .orderBy("es_key", "doc_id")
        .limit(ES_K)
    )


ORACLE_WEIGHTED_PRIORITY = f"""
SELECT doc_id, lang, n_chars,
       {_es_key_exprs('duck')} AS es_key
FROM documents
WHERE n_chars > 0
ORDER BY es_key, doc_id
LIMIT {ES_K}
"""


# ---------------------------------------------------------------------------
# Per-domain cap — C4/RefinedWeb-style source downsampling
# ---------------------------------------------------------------------------

#: max documents retained per domain = (source, lang)
DOMAIN_CAP = 12


def domain_cap_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every (source, lang) domain at {DOMAIN_CAP} documents — the web-
    corpus de-biasing step (C4 kept ≤N pages per domain; RefinedWeb
    caps per registered domain so link farms can't dominate the mix).
    Which docs survive is decided by a deterministic hash order (the
    domain's {DOMAIN_CAP} smallest salted doc hashes), so the kept set
    is rerun-, partitioning-, and engine-stable — never "first N seen".

    Scale posture: per-source counts are a hash-aggregate; sources at
    or under the cap keep everything MAP-SIDE (broadcast count join —
    their rows never shuffle), and only over-cap sources' rows enter
    the per-source ranking window. At web scale that split carries:
    the domain count table is millions of rows (broadcastable), and
    the heavy window runs over the capped minority of rows only. The
    audit output is one row per source: total, kept, kept chars.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = "concat('domcap', CAST(doc_id AS STRING))"
    a, b = th.perm_coeffs(13)
    h = f"(({a} * ({th.polyhash(keyed, 'spark')}) + {b}) % {th.P})"
    hd = docs.selectExpr(
        "doc_id", "source", "lang", "n_chars", f"{h} AS h"
    )
    counts = hd.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # NULL-safe keys: a NULL-lang (or NULL-source) domain is still a
    # domain — groupBy keeps the NULL group, so a plain equi-join back
    # would silently DROP those docs (NULL never equals NULL). <=> is
    # still a hashable equi-key, so the broadcast join strategy holds.
    cn = counts.withColumnsRenamed({"source": "c_source", "lang": "c_lang"})
    with_n = hd.join(
        F.broadcast(cn),
        hd["source"].eqNullSafe(cn["c_source"])
        & hd["lang"].eqNullSafe(cn["c_lang"]),
    ).drop("c_source", "c_lang")
    small_kept = with_n.filter(F.col("n_docs") <= DOMAIN_CAP)
    from pyspark.sql.window import Window

    big_kept = (
        with_n.filter(F.col("n_docs") > DOMAIN_CAP)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source", "lang").orderBy(
                    "h", "doc_id"
                )
            ),
        )
        .filter(F.col("rn") <= DOMAIN_CAP)
        .drop("rn")
    )
    kept = small_kept.unionByName(big_kept)
    return (
        kept.groupBy("source", "lang", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .select("source", "lang", "n_docs", "n_kept", "kept_chars")
    )


def _oracle_domain_cap() -> str:
    keyed = "concat('domcap', CAST(doc_id AS VARCHAR))"
    a, b = th.perm_coeffs(13)
    h = f"(({a} * ({th.polyhash(keyed, 'duck')}) + {b}) % {th.P})"
    return f"""
WITH ranked AS (
  SELECT source, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source, lang
                            ORDER BY {h}, doc_id) AS rn
  FROM documents)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM ranked
GROUP BY source, lang
"""


ORACLE_DOMAIN_CAP = _oracle_domain_cap()


SPECS: dict[str, QuerySpec] = {
    s.name: s
    for s in [
        QuerySpec(
            "chunk_sliding_window",
            chunk_sliding_window,
            ORACLE_CHUNK_SLIDING,
            "overlapping W/S token windows per doc (RAG chunking)",
        ),
        QuerySpec(
            "contamination_ngram_check",
            contamination_ngram_check,
            ORACLE_CONTAMINATION,
            "benchmark decontamination: 5-gram overlap vs broadcast set",
        ),
        QuerySpec(
            "contamination_external_bench",
            contamination_external_bench,
            ORACLE_EXTERNAL_BENCH,
            "decontamination vs external phrase set: broadcast literal, "
            "scan-bound",
        ),
        QuerySpec(
            "split_train_val_test",
            split_train_val_test,
            ORACLE_SPLIT,
            "hash-deterministic 90/5/5 split, per-(lang,split) accounting",
        ),
        QuerySpec(
            "sample_stratified_by_lang",
            sample_stratified_by_lang,
            ORACLE_STRATIFIED,
            "hash-deterministic stratified sampling, per-stratum rates",
        ),
        QuerySpec(
            "mix_domains_weighted",
            mix_domains_weighted,
            ORACLE_MIX_DOMAINS,
            "two-pass domain mixing toward target weights",
        ),
        QuerySpec(
            "mix_domains_temperature",
            mix_domains_temperature,
            ORACLE_MIX_TEMPERATURE,
            "T=2 temperature mixing: share ∝ sqrt(count), IEEE-exact",
        ),
        QuerySpec(
            "pii_redact_audit",
            pii_redact_audit,
            ORACLE_PII_REDACT,
            "ordered regex scrub (emails→ids) with audit counts",
        ),
        QuerySpec(
            "pack_sequences_chunked",
            pack_sequences_chunked,
            ORACLE_PACK_CHUNKED,
            "concat-and-chunk sequence packing via window scan",
        ),
        QuerySpec(
            "pack_sequences_greedy",
            pack_sequences_greedy,
            ORACLE_PACK_GREEDY,
            "greedy whole-doc packing, sharded JVM aggregate; recursive-CTE oracle",
        ),
        QuerySpec(
            "boilerplate_chunk_filter",
            boilerplate_chunk_filter,
            ORACLE_BOILERPLATE,
            "CCNet-style cross-doc boilerplate chunk removal audit",
        ),
        QuerySpec(
            "dsir_importance_selection",
            dsir_importance_selection,
            ORACLE_DSIR,
            "DSIR hashed-unigram importance resampling: top-K toward "
            "target domain",
        ),
        QuerySpec(
            "curate_corpus_funnel",
            curate_corpus_funnel,
            ORACLE_CURATE,
            "end-to-end curation funnel: quality -> dedup -> decontam "
            "-> sample, one lazy plan",
        ),
        QuerySpec(
            "token_budget_select",
            token_budget_select,
            ORACLE_TOKEN_BUDGET,
            "per-language token-budget selection via histogram "
            "threshold + boundary-bucket prefix sum (no global sort)",
        ),
        QuerySpec(
            "sample_weighted_priority",
            sample_weighted_priority,
            ORACLE_WEIGHTED_PRIORITY,
            "Efraimidis-Spirakis weighted sample w/o replacement: "
            "-ln(u)/w priority keys, distributed top-k, no RNG state",
        ),
        QuerySpec(
            "domain_cap_downsample",
            domain_cap_downsample,
            ORACLE_DOMAIN_CAP,
            "C4-style per-domain cap: hash-ordered keep set, under-cap "
            "domains stay map-side, only over-cap rows shuffle",
        ),
    ]
}
