"""Interleaved A/B: row-join verify (old) vs array-intersect verify
(new) for jaccard + containment at sf10, one session, noop sink.
Memos pre-built and shared; each run executes the full candidate+verify
chain fresh (one-shot cost, guide §1.4)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from gcp_dbt_data_engineering_spark import get_spark
from gcp_dbt_data_engineering_spark.operators import dedup

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.artifacts/sf10"
spark = get_spark(app_name="ab_verify_sf10")

t0 = time.perf_counter()
sh = dedup._shingle_rows(spark, SF)
ranked = dedup._ranked_shingles(spark, SF)
sizes = dedup._shingle_sizes(spark, SF)
sets = dedup._shingle_sets(spark, SF)
print(f"memo build: {time.perf_counter() - t0:.1f}s", flush=True)


def old_jaccard(pairs):
    a = sh.select(F.col("doc_id").alias("doc_a"), "h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.selectExpr("doc_id AS doc_a", "n AS na"), "doc_a")
        .join(sizes.selectExpr("doc_id AS doc_b", "n AS nb"), "doc_b")
        .selectExpr(
            "doc_a", "doc_b",
            "CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) AS jaccard",
        )
        .filter(F.col("jaccard") >= dedup.JACCARD_T)
    )


def old_containment():
    tn, td = dedup.CONTAIN_T_NUM, dedup.CONTAIN_T_DEN
    pref = (
        ranked.filter(F.expr(dedup._prefix_filter_expr(tn, td)))
        .select(F.col("doc_id").alias("doc_a"), "h", F.col("n").alias("na"))
    )
    full_b = sh.select(F.col("doc_id").alias("doc_b"), "h")
    sz_b = sizes.withColumnRenamed("n", "nb")
    cands = (
        pref.join(full_b, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .join(F.broadcast(sz_b.selectExpr("doc_id AS doc_b", "nb")), "doc_b")
        .filter(F.expr(f"{tn} * na <= {td} * nb"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.selectExpr("doc_id AS doc_a", "n AS na"), "doc_a")
        .filter(F.expr(f"{td} * i >= {tn} * na"))
        .selectExpr(
            "doc_a AS contained_doc",
            "doc_b AS container_doc",
            "CAST(i AS DOUBLE) / CAST(na AS DOUBLE) AS containment",
        )
    )


def run(df, label):
    spark.sparkContext.setJobDescription(label)
    t = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t
    print(f"{label}: {dt:.1f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


cands_j = dedup._ppjoin_candidates(None, ranked)
new_j = dedup._jaccard_pairs(cands_j, sets, dedup.JACCARD_T)
old_j = old_jaccard(cands_j)
new_c = dedup.dedup_containment(spark, SF)
old_c = old_containment()

for rep in range(2):
    run(new_j, f"new_jaccard_{rep}")
    run(old_j, f"old_jaccard_{rep}")
    run(new_c, f"new_containment_{rep}")
    run(old_c, f"old_containment_{rep}")
print("DONE", flush=True)
