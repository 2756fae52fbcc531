"""Staged/sliced-exact sf100 evidence for the two embedding-family
specs whose full runs are intractable at sf100 — and whose TRUE output
is quadratic there by corpus construction, not by engine defect:
``make_sfN`` replicates embeddings VERBATIM (its own docstring), so at
factor 1000 every cross-replica copy pair has cosine exactly 1.0 and
``dedup_embedding_cosine``'s full answer is ~C(1000,2)·n_base ≈ 1e9
pairs. The engine's scale story for these specs is the bounded tiled
kernel + the occupancy audit (ANN_CANDIDATES.json — per-SF records are
merged, never overwritten, by ``tools/ann_candidates.merge_into``); THIS
tool supplies exact correctness evidence at sf100 the same way the
sf10 recheck did for phash/pagerank (tools/sf10_recheck.py):

- **dedup_embedding_cosine** — sliced-exact: Spark computes ALL pairs
  touching a deterministic slice (``vec_id % SLICE_MOD == 0``; at the
  default 1000 that is 2 vectors per replica) with the spec's own
  quantization + Gram/cosine arithmetic, distributed via
  ``mapInPandas`` with the sliced side broadcast in the closure. A
  single-process numpy replay recomputes the same slice independently
  (different engine + orchestration — the pagerank python-replay
  precedent), and a DuckDB micro-slice (every 100th sliced id)
  re-verifies with fully independent list-SQL arithmetic.
- **dedup_semantic** — staged-exact: the k-means fit + assignment are
  LINEAR and run in full on Spark (the spec's own
  ``_kmeans_cents_df``/``_assign_cids``); the numpy replay recomputes
  seeds → Lloyd → assignment from the raw parquet (exact int64, same
  tie rules) and the full 2M-row assignments must agree. Per-vector
  verdicts (a verdict depends only on pairs where the vec is the
  larger endpoint) are then compared on the slice, Spark vs numpy,
  plus a DuckDB micro-slice of verdicts computed by SQL over the
  replayed assignments.

Float discipline: every cosine is CAST(exact-int64-dot AS DOUBLE)
/ (sqrt(double(nn_a)) * sqrt(double(nn_b))) — correctly-rounded IEEE
ops on exact integers, so numpy / Spark-worker-numpy / DuckDB agree
bit-for-bit (the same argument the spec's own sf<=1 full-hash oracle
rests on).

Self-test (run before trusting sf100): ``python tools/sf100_recheck.py
/root/testdata/sf0.1 --selftest`` also compares the sliced outputs
against the FULL spec outputs filtered to the slice — validating the
replay's seed/Lloyd/tie/verdict arithmetic against the
already-oracle-verified specs.

Writes CORRECTNESS_sf100_recheck.json (or the path in $RECHECK_OUT).
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import duckdb
import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from correctness_full import _canon, _sha  # noqa: E402

SLICE_MOD = int(os.environ.get("SLICE_MOD", "1000"))
#: every DUCK_EVERY-th sliced id gets the fully-independent DuckDB check
DUCK_EVERY = int(os.environ.get("DUCK_EVERY", "100"))

# ---------------------------------------------------------------------------
# numpy replay of the spec arithmetic (exact int64 everywhere)
# ---------------------------------------------------------------------------

#: constants mirrored from operators.sketch / operators.dedup /
#: operators.similarity / operators.semdedup — asserted against the
#: modules at import time below so drift fails loudly.
P_MIX = 2_147_483_647
A1, B1 = 1_103_515_245, 12_345
A2, B2 = 69_069, 1
QSCALE = 1 << 20
COSINE_T = 0.4
SEM_COSINE_T = 0.4
K_CLUSTERS = 8
KM_ITERS = 2


def _assert_constants() -> None:
    from gcp_dbt_data_engineering_spark.operators import dedup, sketch
    from gcp_dbt_data_engineering_spark.operators import semdedup
    from gcp_dbt_data_engineering_spark.operators import similarity

    assert sketch.P == P_MIX and (sketch.A1, sketch.B1) == (A1, B1)
    assert (sketch.A2, sketch.B2) == (A2, B2)
    assert dedup.QSCALE == QSCALE and dedup.COSINE_T == COSINE_T
    assert semdedup.SEM_COSINE_T == SEM_COSINE_T
    assert similarity.K_CLUSTERS == K_CLUSTERS
    assert similarity.KM_ITERS == KM_ITERS


def _mix(v: np.ndarray) -> np.ndarray:
    """numpy twin of sketch._hll_hash (vec_id is non-negative)."""
    h = ((v % P_MIX) * A1 + B1) % P_MIX
    h = h ^ (h >> 16)
    h = (h * A2 + B2) % P_MIX
    h = h ^ (h >> 13)
    h = (h * A1 + B1) % P_MIX
    return h


def _load_quantized(sf_dir: str):
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"],
    )
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    labels = t.column("label").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = np.floor(emb * QSCALE).astype(np.int64)
    nn = (q * q).sum(axis=1)
    return ids, labels, q, nn


def _kmeans_replay(ids: np.ndarray, q: np.ndarray):
    """Seeds -> Lloyd iterations -> final assignment, exactly as
    similarity._kmeans_cents_df: seeds are the K smallest by
    (mix(vec_id), vec_id); distances are exact int64 L2 with ties to
    the smaller cid (argmin over the cid-ascending centroid list);
    recenter is floor(double(int64 sum) / count); emptied clusters
    disappear."""
    order = np.lexsort((ids, _mix(ids)))
    seed_rows = order[:K_CLUSTERS]
    cents = [(cid, q[r].copy()) for cid, r in enumerate(seed_rows)]

    def assign(cent_list):
        l2 = np.empty((len(ids), len(cent_list)), dtype=np.int64)
        for pos, (_cid, cv) in enumerate(cent_list):
            d = q - cv[None, :]
            l2[:, pos] = (d * d).sum(axis=1)
        pos_min = np.argmin(l2, axis=1)  # first (= smallest cid) wins ties
        cids = np.array([c for c, _ in cent_list], dtype=np.int64)
        return cids[pos_min]

    for _ in range(KM_ITERS):
        a = assign(cents)
        nxt = []
        for cid in np.unique(a):
            m = a == cid
            s = q[m].sum(axis=0)
            cnt = int(m.sum())
            nxt.append(
                (int(cid), np.floor(s.astype(np.float64) / cnt).astype(np.int64))
            )
        nxt.sort(key=lambda t: t[0])
        cents = nxt
    return assign(cents), cents


def _slice_pairs_numpy(ids, labels, q, nn, mod: int):
    """All (min,max,cosine) pairs with cosine >= COSINE_T touching the
    vec_id % mod == 0 slice, within label — single-process replay."""
    out = set()
    sl = ids % mod == 0
    for lab in np.unique(labels):
        lm = labels == lab
        sm = lm & sl
        if not sm.any():
            continue
        X_ids, S_ids = ids[lm], ids[sm]
        G = q[lm] @ q[sm].T
        cos = G.astype(np.float64) / np.outer(
            np.sqrt(nn[lm].astype(np.float64)),
            np.sqrt(nn[sm].astype(np.float64)),
        )
        xi, si = np.nonzero(cos >= COSINE_T)
        for i, j in zip(xi.tolist(), si.tolist()):
            a, b = int(X_ids[i]), int(S_ids[j])
            if a == b:
                continue
            out.add((min(a, b), max(a, b), float(cos[i, j])))
    return sorted(out)


def _semantic_verdicts_numpy(ids, q, nn, cids, mod: int):
    """(vec_id, cid, status, dup_of) for the sliced vecs: dup_of is the
    smallest same-cluster vec_id < vec_id with cosine >= SEM_COSINE_T."""
    rows = []
    by_cid = {
        int(c): np.nonzero(cids == c)[0] for c in np.unique(cids)
    }
    sl_idx = np.nonzero(ids % mod == 0)[0]
    for i in sl_idx.tolist():
        vb, cb = int(ids[i]), int(cids[i])
        sub = by_cid[cb]
        sub = sub[ids[sub] < vb]
        dup = None
        if sub.size:
            dots = q[sub] @ q[i]
            cos = dots.astype(np.float64) / (
                np.sqrt(nn[sub].astype(np.float64))
                * np.sqrt(float(nn[i]))
            )
            hit = ids[sub][cos >= SEM_COSINE_T]
            if hit.size:
                dup = int(hit.min())
        rows.append(
            (vb, cb, "dropped" if dup is not None else "kept", dup)
        )
    return sorted(rows)


# ---------------------------------------------------------------------------
# Spark sliced sides (distributed, built from the spec's own pieces)
# ---------------------------------------------------------------------------


def _spark_slice_pairs(spark, sf_dir: str, mod: int):
    """Distributed twin of _slice_pairs_numpy: the sliced side rides in
    the closure; every executor batch does one numpy Gram block —
    the same kernel shape as the spec's embedding_cosine_pairs."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gcp_dbt_data_engineering_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").selectExpr(
        "vec_id",
        "label",
        f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {QSCALE}) AS BIGINT)) AS q",
    )
    sliced = emb.filter(F.col("vec_id") % mod == 0).toPandas()
    by_label = {}
    for lab, g in sliced.groupby("label"):
        S = np.asarray(g["q"].tolist(), dtype=np.int64)
        by_label[lab] = (
            g["vec_id"].to_numpy().astype(np.int64),
            S,
            np.sqrt((S * S).sum(axis=1).astype(np.float64)),
        )

    def batches(it):
        for pdf in it:
            outs = []
            for lab, g in pdf.groupby("label"):
                blk = by_label.get(lab)
                if blk is None:
                    continue
                s_ids, S, s_nrm = blk
                X = np.asarray(g["q"].tolist(), dtype=np.int64)
                x_ids = g["vec_id"].to_numpy().astype(np.int64)
                G = X @ S.T
                cos = G.astype(np.float64) / np.outer(
                    np.sqrt((X * X).sum(axis=1).astype(np.float64)),
                    s_nrm,
                )
                xi, si = np.nonzero(cos >= COSINE_T)
                a, b = x_ids[xi], s_ids[si]
                keep = a != b
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_a": np.minimum(a[keep], b[keep]),
                            "vec_b": np.maximum(a[keep], b[keep]),
                            "cosine": cos[xi[keep], si[keep]],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    return emb.mapInPandas(
        batches, schema="vec_a bigint, vec_b bigint, cosine double"
    ).distinct()


def _spark_semantic_sliced(spark, sf_dir: str, mod: int):
    """Spark fit+assign in FULL (the spec's own plan), then sliced
    verdicts via a closure-broadcast of the sliced members."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gcp_dbt_data_engineering_spark.operators.semdedup import (
        dedup_semantic,  # noqa: F401  (parity reference)
    )
    from gcp_dbt_data_engineering_spark.operators.similarity import (
        _assign_cids,
        _kmeans_cents_df,
        _quantized,
    )

    base = _quantized(spark, sf_dir)
    cents = _kmeans_cents_df(base, K_CLUSTERS, KM_ITERS)
    # persist: the fit + assignment lineage is consumed by three
    # actions (slice toPandas, the verdict job's two join sides)
    members = _assign_cids(base, cents, extra_cols=("vec_id", "q")).persist()

    sl = members.filter(F.col("vec_id") % mod == 0).toPandas()
    by_cid = {}
    for cid, g in sl.groupby("cid"):
        Y = np.asarray(g["q"].tolist(), dtype=np.int64)
        by_cid[cid] = (
            g["vec_id"].to_numpy().astype(np.int64),
            Y,
            np.sqrt((Y * Y).sum(axis=1).astype(np.float64)),
        )

    def batches(it):
        for pdf in it:
            outs = []
            for cid, g in pdf.groupby("cid"):
                blk = by_cid.get(cid)
                if blk is None:
                    continue
                y_ids, Y, y_nrm = blk
                X = np.asarray(g["q"].tolist(), dtype=np.int64)
                x_ids = g["vec_id"].to_numpy().astype(np.int64)
                G = X @ Y.T
                cos = G.astype(np.float64) / np.outer(
                    np.sqrt((X * X).sum(axis=1).astype(np.float64)),
                    y_nrm,
                )
                xi, yi = np.nonzero(
                    (cos >= SEM_COSINE_T) & (x_ids[:, None] < y_ids[None, :])
                )
                outs.append(
                    pd.DataFrame(
                        {"vb": y_ids[yi], "va": x_ids[xi]}
                    )
                )
            if outs:
                yield pd.concat(outs)

    dropped = (
        members.mapInPandas(batches, schema="vb bigint, va bigint")
        .groupBy("vb")
        .agg(F.min("va").alias("dup_of"))
    )
    slm = members.filter(F.col("vec_id") % mod == 0).select("vec_id", "cid")
    verdicts = (
        slm.join(dropped, slm.vec_id == dropped.vb, "left")
        .select(
            slm.vec_id,
            "cid",
            F.when(F.col("dup_of").isNotNull(), F.lit("dropped"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            "dup_of",
        )
    )
    return members.select("vec_id", "cid"), verdicts


# ---------------------------------------------------------------------------
# DuckDB micro-slices (fully independent arithmetic, bounded work)
# ---------------------------------------------------------------------------

_QN = f"""
q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)) AS qv
  FROM read_parquet('{{emb}}')),
qn AS (
  SELECT vec_id, label, qv,
         list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nn
  FROM q)"""

_COS = (
    "CAST(list_reduce(list_transform(generate_series(1, len(a.qv)),"
    " i -> a.qv[i] * b.qv[i]), (s, t) -> s + t) AS DOUBLE)"
    " / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))"
)


def _duck_pairs(con, emb_path: str, duck_ids: list[int]):
    lst = ",".join(map(str, duck_ids))
    sql = f"""
WITH {_QN.format(emb=emb_path)},
s AS (SELECT * FROM qn WHERE vec_id IN ({lst})),
c AS (
  SELECT LEAST(a.vec_id, b.vec_id) AS vec_a,
         GREATEST(a.vec_id, b.vec_id) AS vec_b,
         {_COS} AS cosine
  FROM qn a JOIN s b
    ON a.label = b.label AND a.vec_id <> b.vec_id)
SELECT DISTINCT vec_a, vec_b, cosine FROM c WHERE cosine >= {COSINE_T}
"""
    return con.execute(sql).fetchall()


def _duck_semantic(con, emb_path: str, assign_rows, duck_ids: list[int]):
    import pandas as pd

    con.register(
        "assign_np",
        pd.DataFrame(assign_rows, columns=["vec_id", "cid"]),
    )
    lst = ",".join(map(str, duck_ids))
    sql = f"""
WITH {_QN.format(emb=emb_path)},
m AS (SELECT n.vec_id, a.cid, n.qv, n.nn
      FROM qn n JOIN assign_np a USING (vec_id)),
y AS (SELECT * FROM m WHERE vec_id IN ({lst})),
dropped AS (
  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
  FROM m a JOIN y b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_COS} >= {SEM_COSINE_T}
  GROUP BY b.vec_id)
SELECT y.vec_id, y.cid,
       CASE WHEN d.vec_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
       d.dup_of
FROM y LEFT JOIN dropped d ON d.vec_id = y.vec_id
"""
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".artifacts/sf100"
    selftest = "--selftest" in sys.argv
    _assert_constants()

    from gcp_dbt_data_engineering_spark import get_spark

    spark = get_spark(app_name="sf100_recheck")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")

    out: dict[str, dict] = {}

    def record(name, method, s_cols, s_rows, o_cols, o_rows, extra=None):
        rec = {
            "method": method,
            "rows_match": len(s_rows) == len(o_rows),
            "schema_match": sorted(s_cols) == sorted(o_cols),
            "spark_rows": len(s_rows),
            "oracle_rows": len(o_rows),
            "err": None,
        }
        s_c, o_c = _canon(s_cols, s_rows), _canon(o_cols, o_rows)
        rec["hash_match"] = s_c == o_c
        rec["spark_sha"], rec["oracle_sha"] = _sha(s_c), _sha(o_c)
        if extra:
            rec.update(extra)
        prior = out.get(name)
        if prior is not None:  # merge: every stage must hold
            rec["hash_match"] = rec["hash_match"] and prior["hash_match"]
            rec["method"] = prior["method"] + " ; " + rec["method"]
            rec["stages"] = prior.get("stages", [prior["spark_rows"]]) + [
                rec["spark_rows"]
            ]
        out[name] = rec
        flag = "OK " if rec["hash_match"] else "MISMATCH"
        print(f"{flag} {name}: {method}: spark={len(s_rows)}"
              f" vs replay={len(o_rows)}", flush=True)

    ids, labels, q, nn = _load_quantized(sf_dir)
    print(f"corpus: {len(ids)} vectors", flush=True)

    # ---- dedup_embedding_cosine: sliced-exact --------------------------
    try:
        np_pairs = _slice_pairs_numpy(ids, labels, q, nn, SLICE_MOD)
        sp = _spark_slice_pairs(spark, sf_dir, SLICE_MOD)
        s_rows = [tuple(r) for r in sp.collect()]
        record(
            "dedup_embedding_cosine",
            f"sliced-exact: all pairs touching vec_id % {SLICE_MOD} == 0;"
            " Spark mapInPandas (closure-broadcast slice) vs"
            " single-process numpy replay",
            ["vec_a", "vec_b", "cosine"],
            s_rows,
            ["vec_a", "vec_b", "cosine"],
            np_pairs,
        )
        sl_ids = sorted(int(v) for v in ids[ids % SLICE_MOD == 0])
        duck_ids = sl_ids[:: DUCK_EVERY] or sl_ids[:1]
        d_rows = _duck_pairs(con, emb_path, duck_ids)
        dset = set(duck_ids)
        np_sub = [
            r for r in np_pairs if r[0] in dset or r[1] in dset
        ]
        record(
            "dedup_embedding_cosine",
            f"duckdb micro-slice: {len(duck_ids)} ids, independent"
            " list-SQL arithmetic",
            ["vec_a", "vec_b", "cosine"],
            d_rows,
            ["vec_a", "vec_b", "cosine"],
            np_sub,
        )
        if selftest:
            from gcp_dbt_data_engineering_spark.operators.dedup import (
                SPECS as DSPECS,
            )

            full = DSPECS["dedup_embedding_cosine"].spark(spark, sf_dir)
            f_rows = [
                tuple(r)
                for r in full.filter(
                    f"vec_a % {SLICE_MOD} = 0 OR vec_b % {SLICE_MOD} = 0"
                ).collect()
            ]
            record(
                "dedup_embedding_cosine",
                "selftest: FULL spec output filtered to the slice",
                ["vec_a", "vec_b", "cosine"],
                f_rows,
                ["vec_a", "vec_b", "cosine"],
                np_pairs,
            )
    except Exception:  # noqa: BLE001
        out["dedup_embedding_cosine"] = {
            "err": traceback.format_exc(limit=3), "hash_match": False,
        }
        print(out["dedup_embedding_cosine"]["err"])

    # ---- dedup_semantic: staged-exact -----------------------------------
    try:
        cids_np, _cents = _kmeans_replay(ids, q)

        sp_assign, sp_verd = _spark_semantic_sliced(
            spark, sf_dir, SLICE_MOD
        )
        s_rows = [tuple(r) for r in sp_assign.collect()]
        np_assign = sorted(zip(ids.tolist(), cids_np.tolist()))
        record(
            "dedup_semantic",
            "staged-exact stage 1: FULL k-means fit+assignment, Spark"
            " JVM plan vs numpy replay from raw parquet",
            ["vec_id", "cid"],
            s_rows,
            ["vec_id", "cid"],
            np_assign,
        )

        np_verd = _semantic_verdicts_numpy(ids, q, nn, cids_np, SLICE_MOD)
        sv_rows = [tuple(r) for r in sp_verd.collect()]
        record(
            "dedup_semantic",
            f"staged-exact stage 2: per-vector verdicts for vec_id %"
            f" {SLICE_MOD} == 0 (verdict depends only on"
            " larger-endpoint pairs), Spark vs numpy replay",
            ["vec_id", "cid", "status", "dup_of"],
            sv_rows,
            ["vec_id", "cid", "status", "dup_of"],
            np_verd,
        )
        sl_ids = sorted(int(v) for v in ids[ids % SLICE_MOD == 0])
        duck_ids = sl_ids[:: DUCK_EVERY] or sl_ids[:1]
        d_rows = _duck_semantic(con, emb_path, np_assign, duck_ids)
        dset = set(duck_ids)
        np_sub = [r for r in np_verd if r[0] in dset]
        record(
            "dedup_semantic",
            f"duckdb micro-slice: verdicts for {len(duck_ids)} ids by"
            " independent SQL over the replayed assignments",
            ["vec_id", "cid", "status", "dup_of"],
            d_rows,
            ["vec_id", "cid", "status", "dup_of"],
            np_sub,
        )
        if selftest:
            from gcp_dbt_data_engineering_spark.operators.semdedup import (
                SPECS as SEMSPECS,
            )

            full = SEMSPECS["dedup_semantic"].spark(spark, sf_dir)
            f_rows = [
                tuple(r)
                for r in full.filter(f"vec_id % {SLICE_MOD} = 0").collect()
            ]
            record(
                "dedup_semantic",
                "selftest: FULL spec verdicts filtered to the slice",
                ["vec_id", "cid", "status", "dup_of"],
                f_rows,
                ["vec_id", "cid", "status", "dup_of"],
                np_verd,
            )
    except Exception:  # noqa: BLE001
        out["dedup_semantic"] = {
            "err": traceback.format_exc(limit=3), "hash_match": False,
        }
        print(out["dedup_semantic"]["err"])

    path = os.path.join(
        REPO, os.environ.get("RECHECK_OUT", "CORRECTNESS_sf100_recheck.json")
    )
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "slice_mod": SLICE_MOD, "specs": out},
            f,
            indent=1,
        )
    bad = sum(1 for r in out.values() if not r.get("hash_match"))
    print(f"sf100_recheck: {len(out)} specs, {bad} not exact -> {path}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
