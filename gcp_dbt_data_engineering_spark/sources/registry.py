"""Parquet-backed table registry.

Replaces the reference's BigQuery scan/sink pair
(``tests/dq_sql_notes.md:74``: ``spark.read.format("bigquery")``;
``tests/profiling_example.py:24-28``: APPEND sink) with parquet sources
(SURVEY.md §2.1 S1/S2). The registry is the single place that knows the
physical layout, so every operator above it is storage-agnostic — on a
real deployment this is where you'd swap in a catalog table, Iceberg
layout, or the BigQuery connector again.

Scale notes (100 TB posture):

- Reads are plain ``spark.read.parquet`` → Catalyst handles column
  pruning + predicate/aggregate pushdown + partition pruning; nothing is
  collected to the driver.
- ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Spark 4 reads it
  only as bigint (``spark.sql.legacy.parquet.nanosAsLong``); we rebuild a
  ``timestamp_ntz`` from the raw nanos with integer arithmetic — a
  codegen-friendly projection, no UDF, negligible cost at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

#: All tables the driver test data provides (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Static column → type-kind map for the driver tables (TESTDATA.md).
#: Used where a plan must be built without a live session (e.g. the
#: DuckDB-oracle compiler needs dtype guards before Spark runs).
#: kinds: "string" | "float" (isnan applies) | "int" | "date" | other
TABLE_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "float", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "float",
    },
    "part": {
        "p_partkey": "int", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "float",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "string",
        "o_totalprice": "float", "o_orderdate": "date",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "float",
        "l_extendedprice": "float", "l_discount": "float", "l_tax": "float",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "date",
    },
    "events": {
        "event_id": "int", "ts": "date", "user_id": "int",
        "event_type": "string", "value": "float", "props": "string",
    },
    "documents": {
        "doc_id": "int", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int",
    },
    "embeddings": {"vec_id": "int", "embedding": "array", "label": "int"},
}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


#: Fact tables below this size stay on the raw single file; above it a
#: one-row-group file would serialize every scan's decode on one core.
#: 400 KB catches documents/embeddings at sf0.1 — their staged layout
#: also lets spread() skip its repartition shuffle in every corpus
#: operator (measured: unigram-logprob 0.92->0.50 s, minhash 0.82->0.69).
STAGE_MIN_BYTES = 400_000
STAGE_DIR = "/root/repo/.artifacts/staged"


def _stage_if_unsplittable(
    spark: SparkSession, path: str, name: str, sf_dir: str
) -> str:
    """Return a readable path whose parquet layout splits across cores.

    The driver fixtures are ONE row group per table, and parquet only
    splits at row-group boundaries — so Spark decodes a 600k-row
    lineitem on a single core no matter what ``maxPartitionBytes``
    says, on every scan of every query (``spread()`` can't help: the
    serial decode happens *before* its shuffle). The fix is the same
    one-time ingest/compaction step any lake runs (Delta OPTIMIZE,
    Iceberg rewrite_data_files): rewrite the table once into
    ~parallelism-sized files under ``.artifacts/staged`` and read that.
    Keyed by (mtime, size) of the source so a regenerated corpus
    re-stages; written to a tmp dir + atomic rename so concurrent
    sessions can race safely; layout only — row *contents* are
    byte-identical, which every DuckDB oracle (reading the RAW file)
    re-proves on each gate run.
    """
    try:
        st = os.stat(path)
    except OSError:
        return path
    if st.st_size < STAGE_MIN_BYTES:
        return path
    try:
        import pyarrow.parquet as pq

        if pq.ParquetFile(path).metadata.num_row_groups > 1:
            return path  # already splittable; read the raw file
    except Exception:
        return path
    sftag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    tag = f"{name}@{sftag}-{st.st_mtime_ns}-{st.st_size}"
    staged = os.path.join(STAGE_DIR, tag)
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        n = min(16, spark.sparkContext.defaultParallelism)
        tmp = f"{staged}.tmp-{os.getpid()}"
        spark.read.parquet(path).repartition(n).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, staged)
        except OSError:  # another session won the race
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        # prune layouts staged from older versions of THIS (table, sf)
        # source (mtime/size key changed => the corpus was regenerated);
        # other scale factors' layouts are distinct prefixes and live
        # on. Age-gated: a concurrent session's lazy DataFrames may
        # still reference a layout it staged moments ago (staged paths
        # are cached per session), so only reap directories old enough
        # that no live session plausibly still points at them.
        import shutil
        import time

        prune_ttl_s = 3600.0
        for d in os.listdir(STAGE_DIR):
            if (
                d.startswith(f"{name}@{sftag}-")
                and d != tag
                and ".tmp-" not in d
            ):
                full = os.path.join(STAGE_DIR, d)
                try:
                    age = time.time() - os.stat(full).st_mtime
                except OSError:
                    continue
                if age > prune_ttl_s:
                    shutil.rmtree(full, ignore_errors=True)
    return staged


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the events nanosecond timestamp.

    Memoized per (session, path): ``spark.read.parquet`` does a
    driver-side footer/schema read (~0.1-0.2 s each) on every call,
    which dominated plan-build time for multi-table specs. DataFrame
    plans are immutable, so reusing one per session is free; the cache
    dies with the session object.
    """
    tune(spark)
    cache: dict[str, DataFrame] = spark.__dict__.setdefault(
        "_graft_table_cache", {}
    )
    path = table_path(sf_dir, name)
    df = cache.get(path)
    if df is None:
        df = spark.read.parquet(
            _stage_if_unsplittable(spark, path, name, sf_dir)
        )
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            # nanos → micros with integer division, then NTZ timestamp.
            # Session TZ is UTC (session.RUNTIME_CONF) so LTZ→NTZ is
            # lossless.
            df = df.withColumn(
                "ts",
                F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"),
            )
        cache[path] = df
    return df


def load_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Format-dispatching reader (S1 generalized): parquet (columnar,
    splittable — the default and the only sane 100 TB choice), orc
    (the other columnar lake format, built into Spark), csv and
    json (ingest-edge formats; header/inference defaulted on, but pass
    ``schema`` in production — inference scans the data twice).
    """
    if fmt not in ("parquet", "csv", "json", "orc"):
        raise ValueError(f"unsupported source format: {fmt!r}")
    tune(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true" if schema is None else "false"}
        opts.update(options)
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    return reader.options(**options).parquet(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Format-dispatching writer (S2 generalized). ``partition_by``
    produces hive-layout directories — the physical contract that
    makes the reference's daily ``fecha`` slices partition-pruned
    reads instead of full scans (SURVEY.md §1.1/§4).
    """
    if fmt not in ("parquet", "csv", "json", "orc"):
        raise ValueError(f"unsupported sink format: {fmt!r}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)


#: Byte-size suffixes per Spark's JavaUtils.byteStringAsBytes (binary
#: powers; bare numbers are bytes).
_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_bytes(raw: str) -> int:
    """Parse a Spark byte-size conf value ('128m', '1g', '134217728b').

    Stripping non-digits (the old behavior) read '128m' as 128 *bytes*,
    inflating the split estimate ~10^6x and silently disabling
    :func:`spread`'s repartition. Mirror Spark's suffix semantics
    instead; raise on anything unrecognized so the caller falls back to
    the RDD partition count rather than acting on garbage.
    """
    s = raw.strip().lower()
    num = s.rstrip("kmgtpb")
    mult = _BYTE_SUFFIX[s[len(num):]]
    return int(num) * mult


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition when the source cannot be split.

    The driver test files are single-row-group parquet, so Spark reads
    each table as ONE partition and any CPU-heavy aggregate runs on
    one core. This helper pays one cheap shuffle to spread rows across
    the cluster when (and only when) the scan came back under-split;
    real multi-row-group/multi-file lakes split at the scan and skip
    the shuffle entirely.
    """
    sc = df.sparkSession.sparkContext
    n = parallelism or sc.defaultParallelism
    # Estimate the scan's split count from file sizes instead of
    # df.rdd.getNumPartitions(): the DF->RDD conversion forces a full
    # plan analysis (~80 ms per call, paid per profiled table per run);
    # file listing + stat is sub-millisecond and AQE never *merges*
    # splits below the size-derived count, so the estimate is exact for
    # plain file scans.
    try:
        files = df.inputFiles()
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"
        )
        maxpb = _parse_bytes(raw)
        est = sum(
            max(1, -(-os.path.getsize(f.removeprefix("file:")) // maxpb))
            for f in files
        )
    except Exception:  # non-file plan or remote FS: fall back to the RDD
        files = []
        est = df.rdd.getNumPartitions()
    if not files:
        est = df.rdd.getNumPartitions()
    if n <= est:
        # already at (or above) the requested parallelism: a
        # repartition would be a pure extra exchange
        return df
    if est < max(2, n // 2):
        return df.repartition(n)
    return df


def spread_by_size(
    df: DataFrame, bytes_per_task: int = 8 << 20
) -> DataFrame:
    """:func:`spread` with DATA-proportional parallelism.

    For stages whose per-task fixed overhead is material (every
    Python-boundary stage pays a ~10-20 ms worker handshake per task,
    measured §4 of OPTIMIZATION_r11), core-count fan-out of a tiny
    input buys nothing and the handshakes add up. Target a minimum
    payload per task instead: parallelism = clamp(input_bytes /
    bytes_per_task, 1, cores). Small corpora stay at their scan split
    count (no shuffle at all); large corpora fan out to every core —
    the same call is right at sf0.001 and at 100 TB.
    """
    sc = df.sparkSession.sparkContext
    try:
        size = sum(
            os.path.getsize(f.removeprefix("file:"))
            for f in df.inputFiles()
        )
    except Exception:
        size = 0
    if not size:
        return df
    n = max(1, min(sc.defaultParallelism, -(-size // bytes_per_task)))
    return spread(df, n)


def register_all(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def collect_table_stats(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TABLES,
) -> dict[str, dict[str, int]]:
    """``ANALYZE TABLE``-equivalent row/size stats for the registry.

    Spark's broadcast decision for file relations comes from raw file
    size alone, and AQE only refines it AFTER a shuffle materializes;
    a cost-based decision made at PLAN time (join side choice,
    broadcast of a table the size estimate misjudges, pre-shuffle
    strategy hints) needs real stats up front — exactly what
    ``ANALYZE TABLE ... COMPUTE STATISTICS`` records into a catalog.
    Temp views over parquet have no catalog entry, so the registry
    gathers the same numbers itself: exact row counts and byte sizes
    from parquet FOOTERS (metadata-only — no data pages are read, so
    this is O(files), not O(bytes), and at 100 TB it is the same
    cheap metadata pass the catalog's ANALYZE runs). Memoized per
    (session, sf_dir). Consumed by :func:`stats_informed_join` and,
    on a catalog-backed deployment, by ``spark.sql.cbo.enabled``.
    """
    import pyarrow.parquet as pq

    cache: dict = spark.__dict__.setdefault("_graft_stats_cache", {})
    got = cache.get(sf_dir)
    if got is not None:
        return got
    stats: dict[str, dict[str, int]] = {}
    for name in tables:
        path = table_path(sf_dir, name)
        rows = 0
        size = 0
        files = (
            [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            rows += pq.ParquetFile(f).metadata.num_rows
            size += os.path.getsize(f)
        stats[name] = {"rows": rows, "size_bytes": size}
    cache[sf_dir] = stats
    return stats


def stats_informed_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    *,
    right_name: str,
    stats: dict[str, dict[str, int]],
    threshold_bytes: int = 10 << 20,
) -> DataFrame:
    """Join with the broadcast decision made from REGISTRY STATS, the
    way a CBO decides it from catalog stats.

    If the right relation's recorded size fits the broadcast
    threshold, the join is hinted broadcast regardless of Spark's own
    size estimate (which, for a derived/aggregated relation, defaults
    to the child's size and routinely blocks an obviously-broadcastable
    side into a sort-merge join). Asserted to FLIP the physical plan
    in tests/test_plan_shapes.py. On a 1000-executor cluster this is
    the difference between shipping a 1 MB dim to every executor and
    shuffling the 100 TB fact side.
    """
    s = stats.get(right_name)
    if s is not None and s["size_bytes"] <= threshold_bytes:
        right = F.broadcast(right)
    return left.join(right, on, how)
