"""Data profiler — reference E3 (``tests/profiling_example.py``).

The reference calls an (undefined) ``SimpleDataProfiler.
profile_multiple_tables(table_list, fecha)`` honoring config
``sample_size`` / ``include_schema_info`` / ``calculate_histograms``
(``tests/profiling_example.py:14-17,52-57``), stamps ``run_id`` /
``environment`` (``:20-21``) and appends to a results table (``:24-28``).
We design its internals Spark-first:

- ONE ``agg`` pass per table computes every per-column statistic
  (count/nulls/distinct/min/max/avg/stddev) — map-side partial
  aggregation, single shuffle of one row; at 100 TB the profile costs
  one scan per table, never one scan per column.
- results melt to long format (one row per column) with a stable
  schema so daily profiles append into one history table.
- ``sample_size`` uses ``df.limit`` (deterministic; the reference's
  contract is "cap the rows profiled") — at cluster scale you'd switch
  the flag to ``df.sample`` for a uniform sample.
- stddev via the exact-decimal sum-of-squares formula so Spark and
  DuckDB agree bit-for-bit (see plans/spec.py determinism rules;
  builtin ``stddev`` merges partial moments in a partition-order-
  dependent way that can't hash-match across engines).
- histograms (``calculate_histograms``) are equi-width bucket counts
  via ``floor((x-min)/width)`` + groupBy — see ``profile_histogram``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.spec import QuerySpec
from ..sources import TABLE_DTYPES, load_table, spread

NUMERIC_KINDS = {"float", "int"}


def _column_stats(
    df: DataFrame, table: str, dtypes: dict[str, str]
) -> DataFrame:
    """Two agg passes → one long-format row per column.

    Pass split matters: the multi-``countDistinct`` agg plans an
    Expand (one row copy per distinct column), and if ANY agg in the
    same pass has an immutable buffer type (``min``/``max`` on
    strings), Spark downgrades the whole thing from HashAggregate to
    SortAggregate — sorting rows x (columns+1). Keeping string
    min/max in their own Expand-free pass leaves the expensive
    distinct pass hash-aggregated; the two one-row results cross-join
    for free.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    str_aggs = []
    for c, kind in dtypes.items():
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        if kind in NUMERIC_KINDS:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
            aggs.append(
                F.sum(F.col(c).cast("decimal(22,6)")).cast("double").alias(f"__sum_{c}")
            )
            aggs.append(
                F.sum((F.col(c) * F.col(c)).cast("decimal(30,8)"))
                .cast("double")
                .alias(f"__sumsq_{c}")
            )
        elif kind == "string":
            str_aggs.append(F.min(F.col(c)).alias(f"__min_s_{c}"))
            str_aggs.append(F.max(F.col(c)).alias(f"__max_s_{c}"))
        elif kind == "date":
            str_aggs.append(
                F.min(F.col(c).cast("date")).cast("string").alias(f"__min_s_{c}")
            )
            str_aggs.append(
                F.max(F.col(c).cast("date")).cast("string").alias(f"__max_s_{c}")
            )
    base = df.agg(*aggs)
    if str_aggs:
        base = base.crossJoin(df.agg(*str_aggs))

    structs = []
    for c, kind in dtypes.items():
        numeric = kind in NUMERIC_KINDS
        total = F.col("__total")
        n = total - F.col(f"__null_{c}")
        if numeric:
            mean = F.when(n > 0, F.col(f"__sum_{c}") / n)
            # exact-decimal sample variance: (sumsq - sum^2/n) / (n-1)
            var = F.when(
                n > 1,
                (F.col(f"__sumsq_{c}") - F.col(f"__sum_{c}") * F.col(f"__sum_{c}") / n)
                / (n - 1),
            )
            stddev = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
        structs.append(
            F.struct(
                F.lit(table).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit(kind).alias("dtype"),
                total.cast("bigint").alias("total_count"),
                F.col(f"__null_{c}").cast("bigint").alias("null_count"),
                F.col(f"__dist_{c}").cast("bigint").alias("distinct_count"),
                (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (mean if numeric else F.lit(None).cast("double")).alias("avg_num"),
                (stddev if numeric else F.lit(None).cast("double")).alias("stddev_num"),
                (
                    F.col(f"__min_s_{c}")
                    if kind in ("string", "date")
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"__max_s_{c}")
                    if kind in ("string", "date")
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return base.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


class SimpleDataProfiler:
    """Spark-native realization of the reference's profiler contract
    (``tests/profiling_example.py:11-17,36-57``)."""

    def __init__(self, spark: SparkSession, settings: dict | None = None):
        self.spark = spark
        self.settings = settings or {}

    def profile_table(
        self, df: DataFrame, table: str, dtypes: dict[str, str] | None = None
    ) -> DataFrame:
        if dtypes is None:
            dtypes = {}
            for c, t in df.dtypes:
                if t in ("double", "float"):
                    dtypes[c] = "float"
                elif t in ("bigint", "int", "smallint", "tinyint"):
                    dtypes[c] = "int"
                elif t == "string":
                    dtypes[c] = "string"
                elif t.startswith(("date", "timestamp")):
                    dtypes[c] = "date"
                else:
                    continue  # arrays/maps: skipped from scalar stats
        sample = self.settings.get("sample_size")
        if sample:
            df = df.limit(int(sample))
        return _column_stats(df, table, dtypes)

    def profile_multiple_tables(
        self, tables: list[str], sf_dir: str, fecha: str | None = None,
        date_column: str | None = None,
    ) -> DataFrame:
        parts = []
        for t in tables:
            # spread: the multi-countDistinct agg expands rows several-
            # fold; an unsplittable single-partition scan would run
            # that expansion on one core (see sources.spread).
            df = spread(load_table(self.spark, sf_dir, t))
            if fecha and date_column and date_column in df.columns:
                df = df.filter(F.col(date_column).cast("date") == F.lit(fecha))
            dtypes = {
                c: k for c, k in TABLE_DTYPES[t].items() if k != "array"
            }
            parts.append(self.profile_table(df, t, dtypes))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def with_run_metadata(self, df: DataFrame, environment: str = "dev") -> DataFrame:
        """Stamp run metadata (reference: profiling_example.py:20-21)."""
        return df.withColumn("run_id", F.lit(str(uuid.uuid4()))).withColumn(
            "environment", F.lit(environment)
        )

    def append_history(self, df: DataFrame, path: str) -> None:
        """Append a profile run to the history table — the reference's
        BigQuery APPEND sink (``tests/profiling_example.py:24-28``,
        SURVEY.md §2.1 S2) over parquet. Long-format rows + stable
        schema make daily runs accumulate into one queryable history.
        """
        df.write.mode("append").parquet(path)


def profile_histogram(
    df: DataFrame, column: str, buckets: int = 10
) -> DataFrame:
    """Equi-width histogram: two scans (min/max, then bucket counts).

    The bucket id is ``floor((x - min) / width)`` clamped to
    ``buckets-1`` — a pure-projection groupBy that scales linearly.
    """
    lo, hi = df.agg(
        F.min(column).cast("double"), F.max(column).cast("double")
    ).first()
    if lo is None or hi is None or hi <= lo:
        lo, hi = (lo or 0.0), (lo or 0.0) + 1.0
    width = (hi - lo) / buckets
    bucket = F.least(
        F.floor((F.col(column) - F.lit(lo)) / F.lit(width)),
        F.lit(buckets - 1),
    ).cast("int")
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket_lo", F.lit(lo) + F.col("bucket") * F.lit(width))
        .withColumn("bucket_hi", F.lit(lo) + (F.col("bucket") + 1) * F.lit(width))
    )


# ---------------------------------------------------------------------------
# Oracle twin for the profile demo (exact mirror of _column_stats over
# TABLE_DTYPES), generated per table so Spark/DuckDB stay in lockstep.
# ---------------------------------------------------------------------------

def _oracle_table_profile(table: str) -> str:
    dtypes = {c: k for c, k in TABLE_DTYPES[table].items() if k != "array"}
    rows = []
    for c, kind in dtypes.items():
        numeric = kind in NUMERIC_KINDS
        if numeric:
            min_num = f"CAST(MIN({c}) AS DOUBLE)"
            max_num = f"CAST(MAX({c}) AS DOUBLE)"
            avg = (
                f"CASE WHEN COUNT({c}) > 0 THEN "
                f"CAST(SUM(CAST({c} AS DECIMAL(22,6))) AS DOUBLE) / COUNT({c}) END"
            )
            stddev = (
                f"CASE WHEN COUNT({c}) > 1 THEN sqrt(greatest("
                f"(CAST(SUM(CAST({c}*{c} AS DECIMAL(30,8))) AS DOUBLE)"
                f" - CAST(SUM(CAST({c} AS DECIMAL(22,6))) AS DOUBLE)"
                f" * CAST(SUM(CAST({c} AS DECIMAL(22,6))) AS DOUBLE) / COUNT({c}))"
                f" / (COUNT({c}) - 1), 0.0)) END"
            )
            min_str = max_str = "CAST(NULL AS VARCHAR)"
        else:
            min_num = max_num = avg = stddev = "CAST(NULL AS DOUBLE)"
            if kind == "date":
                min_str = f"CAST(CAST(MIN({c}) AS DATE) AS VARCHAR)"
                max_str = f"CAST(CAST(MAX({c}) AS DATE) AS VARCHAR)"
            else:
                min_str = f"MIN({c})"
                max_str = f"MAX({c})"
        rows.append(
            f"SELECT '{table}' AS table_name, '{c}' AS column_name, '{kind}' AS dtype, "
            f"COUNT(*) AS total_count, "
            f"COUNT(*) - COUNT({c}) AS null_count, "
            f"COUNT(DISTINCT {c}) AS distinct_count, "
            f"{min_num} AS min_num, {max_num} AS max_num, "
            f"{avg} AS avg_num, {stddev} AS stddev_num, "
            f"{min_str} AS min_str, {max_str} AS max_str "
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(rows)


PROFILE_TABLES = ["customer", "orders", "part", "supplier"]


def profile_core_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SimpleDataProfiler(spark).profile_multiple_tables(
        PROFILE_TABLES, sf_dir
    )


ORACLE_PROFILE = "\nUNION ALL\n".join(
    _oracle_table_profile(t) for t in PROFILE_TABLES
)


HIST_BUCKETS = 10


def profile_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width o_totalprice histogram (``calculate_histograms``
    flag of the reference profiler config)."""
    df = load_table(spark, sf_dir, "orders")
    return profile_histogram(df, "o_totalprice", HIST_BUCKETS).select(
        "bucket", "n", "bucket_lo", "bucket_hi"
    )


#: width/bounds arithmetic mirrors profile_histogram exactly: lo/hi are
#: exact doubles, width = (hi-lo)/buckets, bucket = least(floor(...)),
#: so both engines bucket and label identically.
ORACLE_HISTOGRAM = f"""
WITH mm AS (
  SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
         CAST(MAX(o_totalprice) AS DOUBLE) AS hi
  FROM orders),
b AS (
  SELECT LEAST(CAST(floor((o_totalprice - lo)
                    / ((hi - lo) / {HIST_BUCKETS})) AS INT),
               {HIST_BUCKETS - 1}) AS bucket,
         lo, hi
  FROM orders, mm
  WHERE o_totalprice IS NOT NULL)
SELECT bucket, COUNT(*) AS n,
       lo + bucket * ((hi - lo) / {HIST_BUCKETS}) AS bucket_lo,
       lo + (bucket + 1) * ((hi - lo) / {HIST_BUCKETS}) AS bucket_hi
FROM b
GROUP BY bucket, lo, hi
"""


SPECS: dict[str, QuerySpec] = {
    "profile_core_tables": QuerySpec(
        "profile_core_tables", profile_core_tables, ORACLE_PROFILE,
        "single-agg-pass column profiler over 4 tables, long format",
    ),
    "profile_histogram_orders": QuerySpec(
        "profile_histogram_orders", profile_histogram_orders,
        ORACLE_HISTOGRAM,
        "equi-width histogram (calculate_histograms profiler flag)",
    ),
}
