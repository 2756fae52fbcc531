"""sf100 exact evidence for the three redesigned ANN specs (VERDICT r9
item 5): ``similarity_ann_lsh``, ``similarity_ann_ivf``,
``similarity_ann_ivf_kmeans`` — extending the staged/sliced method that
closed the dedup family at sf100 (tools/sf100_breadth.py) and the ANN
family at sf10 (tools/sf10_recheck.py).

Why not the sf10 method verbatim: at sf10 the Spark spec ran IN FULL
(2k queries x ~48k candidates = 1e8 exact cosines) and only the oracle
was query-sliced. At sf100 the full spec is 20k queries x ~480k
candidates ~ 1e10 exact cosines — quadratic by the corpus's own
construction (queries are a fixed 1% of the corpus), the same
intractability class sf100_breadth documents for the pair specs. The
established staged-exact pattern applies (sf100_recheck.py's
dedup_semantic precedent: full linear artifacts compared whole,
quadratic stage query-sliced, an independent engine replays it):

- **Spark**: the spec's OWN pipeline runs with the query set sliced to
  ``vec_id % QUERY_MOD_SLICED == 0`` (200 queries at sf100) — every
  corpus-side artifact (quantization, 448-plane banding, K=128 Lloyd
  fit, inverted-file assignment, SQ8 codes) is LINEAR and runs in
  full.
- **numpy replay** (independent engine, exact int64/IEEE semantics):
  recomputes quantization, hyperplanes, band keys, seeds -> Lloyd ->
  assignment, probes, compressed scan + re-rank, and the exact top-10
  from the raw parquet. Compared:
  (a) the FULL 2M-row inverted-file assignment, row for row;
  (b) a per-band (count, avalanched-sum) fingerprint of all ~112M
      band keys (collecting 112M rows is pointless when a keyed
      checksum pins them — fingerprint collisions would need
      structured disagreement through an avalanched mix);
  (c) the sliced queries' complete top-10 output, bit-exact including
      the cosine doubles.
- **DuckDB micro-slice** (third engine): numpy's staged artifacts
  (assignments, codes, candidate band keys) load into DuckDB and SQL
  recomputes the final candidate -> exact-cosine -> top-10 stage for
  every 10th sliced query with the spec's own arithmetic text.

Float discipline: cosine is CAST(exact-int64-dot AS DOUBLE) /
(sqrt(double(nn_a)) * sqrt(double(nn_b))) — correctly rounded IEEE ops
on exact integers, identical in all three engines (the argument the
sf<=1 full-hash oracles rest on).

Self-test: ``python tools/sf100_ann_recheck.py /root/testdata/sf0.1
--selftest`` keeps the spec's own QUERY_MOD (no slicing) and the
replayed output must equal the COMMITTED full spec output exactly —
validating every replay rule against the oracle-verified pipeline.

Writes/merges into CORRECTNESS_sf100_recheck.json (same artifact as
sf100_breadth; RECHECK_OUT overrides).

Run:  python tools/sf100_ann_recheck.py [sf_dir] [--selftest]
"""

from __future__ import annotations

import json
import os
import sys
import traceback
from typing import Any

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sf10_recheck import _cmp  # noqa: E402

#: every 100th spec query (spec queries are vec_id % 100 == 0)
QUERY_MOD_SLICED = int(os.environ.get("ANN_SLICE_MOD", "10000"))
#: DuckDB micro-slice: every Nth sliced query. At sf100 use
#: ANN_MICRO_STRIDE=100 (10 queries): the lsh candidate join carries
#: ~580k rows/query through 64-term list folds, and 100 micro queries
#: spilled DuckDB past the disk budget (observed: 60+ GB of .tmp).
MICRO_STRIDE = int(os.environ.get("ANN_MICRO_STRIDE", "10"))

OUT_COLS = ["query_id", "neighbor_id", "rank", "cosine"]


# ---------------------------------------------------------------------------
# numpy replay of the shared quantization + index artifacts
# ---------------------------------------------------------------------------

def _np_quantized(sf_dir: str):
    """(ids, q, nn) replaying _quantized: usability boundary, clamp,
    floor-quantize, zero-norm exclusion. int64 exact."""
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        QCLAMP,
        QSCALE,
    )

    con = duckdb.connect()
    # Arrow fetch, NOT .df(): pandas conversion folds per-element NULL
    # into NaN, conflating "NULL element" (engine keeps the row,
    # quant_transform pins the element to 0) with "true NaN component"
    # (usable_embedding_pred rejects the row). to_pylist() preserves
    # the distinction as Python None.
    tbl = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) "
        "WHERE embedding IS NOT NULL ORDER BY vec_id",
        [os.path.join(sf_dir, "embeddings.parquet")],
    ).arrow()
    all_ids = tbl["vec_id"].to_pylist()
    keep_ids, vecs = [], []
    for vid, e in zip(all_ids, tbl["embedding"].to_pylist()):
        if e is None or len(e) != 64:
            continue
        a = np.asarray(
            [0.0 if x is None else x for x in e], dtype=np.float64
        )
        if not np.all(np.isfinite(a)):
            continue  # true NaN/Inf component rejects the whole row
        keep_ids.append(vid)
        vecs.append(a)
    X = (
        np.array(vecs, dtype=np.float64)
        if vecs else np.empty((0, 64), dtype=np.float64)
    )
    q = np.clip(
        np.floor(X * QSCALE), -float(QCLAMP), float(QCLAMP)
    ).astype(np.int64)
    nn = (q * q).sum(axis=1)
    m = nn > 0
    return np.asarray(keep_ids, dtype=np.int64)[m], q[m], nn[m]


def _np_cosine(dots: np.ndarray, na, nb) -> np.ndarray:
    return dots.astype(np.float64) / (
        np.sqrt(np.float64(na)) * np.sqrt(nb.astype(np.float64))
    )


def _np_topk(ids, q, nn, cand_lists) -> list[tuple]:
    """Exact top-10 rows for each query given per-query candidate index
    arrays — the spec's total order (cosine DESC, neighbor_id ASC)."""
    from gcp_dbt_data_engineering_spark.operators.similarity import TOP_K

    rows = []
    for qi, cand in cand_lists:
        dots = q[cand] @ q[qi]
        cos = _np_cosine(dots, nn[qi], nn[cand])
        order = np.lexsort((ids[cand], -cos))[:TOP_K]
        for r, j in enumerate(order, start=1):
            rows.append(
                (int(ids[qi]), int(ids[cand[j]]), r, float(cos[j]))
            )
    return rows


def _np_kmeans(ids, q, k: int, iters: int):
    """Seeds -> Lloyd -> final assignment, exact int64 + IEEE floor
    (same rules as _kmeans_cents_df; ties to the smaller cid).

    Returns (cents, live, assign) where ``live[pos]`` is the ORIGINAL
    cid of centroid row ``pos`` and ``assign`` holds original cids.
    Clusters that lose all members disappear but the survivors KEEP
    their cid values (Spark's recenter is a groupBy on cid) — a
    position-reindexing replay silently relabels every cid after a
    dead one (caught at sf100: 5 of 128 cells die; the sf0.1 selftest
    had no deaths, so position == cid held by luck). ``live`` stays
    ascending, so positional argmin/lexsort tie-breaks remain
    by-smallest-original-cid."""
    from gcp_dbt_data_engineering_spark.operators.similarity import _mix_np

    order = np.lexsort((ids, _mix_np(ids)))[:k]
    cents = q[order]
    live = np.arange(k, dtype=np.int64)  # original cid per row
    for _ in range(iters):
        a = _np_assign(q, cents)  # positions into cents
        new, kept = [], []
        for pos in range(len(cents)):
            m = a == pos
            if not m.any():
                continue  # lost all members: cluster disappears
            kept.append(live[pos])
            new.append(
                np.floor(
                    q[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
            )
        cents = np.stack(new)
        live = np.asarray(kept, dtype=np.int64)
    return cents, live, live[_np_assign(q, cents)]


def _np_assign(q, cents, chunk: int = 200_000):
    """argmin_c ||q - c||^2, ties to the smaller cid — via the exact
    int64 expansion nn - 2 q.c + cc (all terms < 2^62)."""
    cnn = (cents * cents).sum(axis=1)
    out = np.empty(len(q), dtype=np.int64)
    for lo in range(0, len(q), chunk):
        hi = min(lo + chunk, len(q))
        d2 = (
            (q[lo:hi] * q[lo:hi]).sum(axis=1)[:, None]
            - 2 * (q[lo:hi] @ cents.T)
            + cnn[None, :]
        )
        out[lo:hi] = d2.argmin(axis=1)  # first min = smallest cid
    return out


def _np_band_keys(q, chunk: int = 200_000):
    """(n, n_bands) int64 band keys replaying _spark_chunks, with the
    spec's size-adaptive band geometry (r11): n = full corpus size."""
    from gcp_dbt_data_engineering_spark.operators.similarity import (
        DIM,
        N_PLANES,
        _WHALF,
        _WMOD,
        _mix_np,
        band_geometry,
    )

    n_bands, band_bits = band_geometry(len(q))
    jd = (
        np.arange(N_PLANES, dtype=np.int64)[:, None] * DIM
        + np.arange(DIM, dtype=np.int64)[None, :]
    )
    W = _mix_np(jd) % _WMOD - _WHALF
    pow2 = 1 << np.arange(band_bits, dtype=np.int64)
    out = np.empty((len(q), n_bands), dtype=np.int64)
    for lo in range(0, len(q), chunk):
        hi = min(lo + chunk, len(q))
        bits = (q[lo:hi] @ W.T > 0).astype(np.int64)
        out[lo:hi] = bits.reshape(hi - lo, n_bands, band_bits) @ pow2
    return out


def _np_sq8(sf_dir: str, ids):
    """(c8, n8) int64 codes replaying _sq8_codes for exactly ``ids``
    (row-aligned): scale = max |x| over the raw floats as double;
    code = floor(x/scale*127 + 0.5) — identical IEEE op order."""
    con = duckdb.connect()
    pdf = con.execute(
        "SELECT vec_id, embedding FROM read_parquet(?) "
        "WHERE embedding IS NOT NULL ORDER BY vec_id",
        [os.path.join(sf_dir, "embeddings.parquet")],
    ).df()
    pdf = pdf.set_index("vec_id").loc[ids]
    X = np.nan_to_num(
        np.array(pdf.embedding.tolist(), dtype=np.float64), copy=False
    )
    scale = np.abs(X).max(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        c8 = np.where(
            scale[:, None] > 0.0,
            np.floor(X / scale[:, None] * 127.0 + 0.5),
            0.0,
        ).astype(np.int64)
    return c8, (c8 * c8).sum(axis=1)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".artifacts", "sf100"
    )
    selftest = "--selftest" in sys.argv

    from gcp_dbt_data_engineering_spark import get_spark
    from gcp_dbt_data_engineering_spark.operators import similarity as S

    spark = get_spark(app_name="sf100_ann_recheck")
    qmod = S.QUERY_MOD if selftest else QUERY_MOD_SLICED
    out: dict[str, dict] = {}

    # ---- numpy replay of the shared artifacts -----------------------------
    print("numpy: quantize...", flush=True)
    ids, q, nn = _np_quantized(sf_dir)
    n_corpus = len(ids)
    qidx = np.where(ids % qmod == 0)[0]
    print(f"numpy: corpus={n_corpus} queries={len(qidx)}", flush=True)

    print("numpy: lloyd fit...", flush=True)
    cents, live, assign = _np_kmeans(ids, q, S.IVF_K, S.IVF_ITERS)
    print(f"numpy: {len(cents)} cells", flush=True)
    print("numpy: band keys...", flush=True)
    bands = _np_band_keys(q)

    def probes_for(qi: int, n_probe: int) -> np.ndarray:
        cnn = (cents * cents).sum(axis=1)
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        # positions ascend with original cid (live is sorted), so
        # the positional tie-break IS by-smallest-cid; map to cids
        return live[np.lexsort((live, d2))[:n_probe]]

    def rec_of(name, method, spark_rows, np_rows, extra=None) -> None:
        rec: dict[str, Any] = {"method": method, "err": None}
        try:
            _cmp(rec, OUT_COLS, spark_rows, OUT_COLS, np_rows)
            if extra:
                rec.update(extra)
            ok = (rec["rows_match"] and rec["schema_match"]
                  and rec["hash_match"]
                  and all(v is True for k, v in rec.items()
                          if k.startswith("full_")))
            print(
                f"{'PASS ' if ok else 'FAIL*'} {name}: "
                f"spark={rec['spark_rows']} replay={rec['oracle_rows']}"
                + (f" {extra}" if extra else ""),
                flush=True,
            )
            if not ok and rec.get("first_diff"):
                print(f"      first_diff: {rec['first_diff']}")
        except Exception:  # noqa: BLE001
            rec["err"] = traceback.format_exc(limit=3)
            print(f"ERROR {name}:\n{rec['err']}", flush=True)
        out[name] = rec

    def spark_rows(name):
        orig = S.QUERY_MOD
        try:
            S.QUERY_MOD = qmod
            df = S.SPECS[name].spark(spark, sf_dir)
            return [tuple(r) for r in df.collect()]
        finally:
            S.QUERY_MOD = orig

    method = (
        f"staged-exact: linear artifacts (quantize/banding/Lloyd fit/"
        f"assignment/codes) run IN FULL on Spark and replayed in full "
        f"by numpy; the quadratic query stage sliced to vec_id % "
        f"{qmod} == 0 ({'spec mod — selftest' if selftest else '200'} "
        f"queries); DuckDB SQL re-verifies a micro-slice over the "
        f"staged artifacts"
    )

    # ---- full-assignment comparison (ivf family's linear artifact) --------
    print("spark: full inverted-file assignment...", flush=True)
    sp_members = {
        r.vec_id: r.cid
        for r in S._ivf_members(spark, sf_dir).collect()
    }
    np_members = dict(zip(ids.tolist(), assign.tolist()))
    full_assign_ok = sp_members == np_members
    print(f"full assignment match: {full_assign_ok} "
          f"({len(sp_members)} rows)", flush=True)

    # ---- band-key fingerprint (lsh's linear artifact) ---------------------
    from gcp_dbt_data_engineering_spark.operators.similarity import _mix_np

    P = 2_147_483_647
    mixed = _mix_np(ids)
    np_fp = {
        int(c): (
            len(ids),
            int(((bands[:, c] + 1) * mixed % P).sum() % P),
        )
        for c in range(bands.shape[1])
    }
    qrel = S._quantized(spark, sf_dir)
    S._spark_chunks(
        qrel, *S.band_geometry(qrel.count())
    ).createOrReplaceTempView("__chunks_v")
    sp_fp = {
        int(r.c): (int(r.n), int(r.s))
        for r in spark.sql(
            f"SELECT c, count(*) AS n,"
            f" sum((ck + 1) * ({S._hll_hash('vec_id', 'spark')}) % {P})"
            f" % {P} AS s"
            f" FROM __chunks_v GROUP BY c"
        ).collect()
    }
    band_fp_ok = sp_fp == np_fp
    print(f"band-key fingerprint match: {band_fp_ok} "
          f"({len(sp_fp)} bands)", flush=True)

    # ---- LSH ---------------------------------------------------------------
    print("replay: lsh candidates...", flush=True)
    bucket: dict[tuple[int, int], list[int]] = {}
    for c in range(bands.shape[1]):
        col = bands[:, c]
        for i, k in enumerate(col.tolist()):
            bucket.setdefault((c, k), []).append(i)
    cand_lists = []
    for qi in qidx:
        cs: set[int] = set()
        for c in range(bands.shape[1]):
            cs.update(bucket.get((c, int(bands[qi, c])), ()))
        cs.discard(int(qi))
        cand_lists.append((int(qi), np.fromiter(cs, dtype=np.int64)))
    rec_of(
        "similarity_ann_lsh",
        method,
        spark_rows("similarity_ann_lsh"),
        _np_topk(ids, q, nn, cand_lists),
        extra={"full_band_fingerprint_match": band_fp_ok},
    )

    # ---- IVF-Flat ----------------------------------------------------------
    print("replay: ivf-flat...", flush=True)
    members_by_cid: dict[int, np.ndarray] = {
        int(c): np.where(assign == c)[0] for c in live
    }
    cand_lists = []
    for qi in qidx:
        cells = probes_for(int(qi), S.FLAT_PROBE)
        cand = np.concatenate([members_by_cid[c] for c in cells])
        cand = cand[cand != qi]
        cand_lists.append((int(qi), cand))
    rec_of(
        "similarity_ann_ivf",
        method,
        spark_rows("similarity_ann_ivf"),
        _np_topk(ids, q, nn, cand_lists),
        extra={"full_assignment_match": full_assign_ok},
    )

    # ---- IVF-SQ8 ------------------------------------------------------------
    print("replay: ivf-sq8...", flush=True)
    c8, n8 = _np_sq8(sf_dir, ids)
    rerank = max(S.RERANK_MIN, -(-n_corpus // S.RERANK_DIV))
    cand_lists = []
    for qi in qidx:
        cells = probes_for(int(qi), S.SQ8_PROBE)
        cand = np.concatenate([members_by_cid[c] for c in cells])
        cand = cand[cand != qi]
        s8 = (c8[cand] @ c8[qi]).astype(np.float64) / (
            np.sqrt(np.float64(n8[qi])) * np.sqrt(n8[cand].astype(np.float64))
        )
        top = np.lexsort((ids[cand], -s8))[:rerank]
        cand_lists.append((int(qi), cand[top]))
    rec_of(
        "similarity_ann_ivf_kmeans",
        method,
        spark_rows("similarity_ann_ivf_kmeans"),
        _np_topk(ids, q, nn, cand_lists),
    )

    # ---- IVF-PQ (r11) ------------------------------------------------------
    print("replay: ivf-pq...", flush=True)
    # PQ reconstruction centers replayed from FIRST PRINCIPLES (the
    # 4-bit uniform binning over the quantized components), NOT by
    # unpacking the spec's packed words — if the engine's pack/unpack
    # round-trip were lossy, spec and replay would diverge right here,
    # keeping packing correctness on the staged-exact critical path.
    pqc = (
        S.PQ_LO
        + np.minimum(
            S.PQ_L - 1, np.maximum(0, q - S.PQ_LO) // S.PQ_STEP
        ) * S.PQ_STEP
        + S.PQ_HALF
    )
    cand_lists = []
    for qi in qidx:
        cells = probes_for(int(qi), S.PQ_PROBE)
        cand = np.concatenate([members_by_cid[c] for c in cells])
        cand = cand[cand != qi]
        diff = pqc[cand] - q[qi]  # int64: 64·(2·QCLAMP)² fits
        adc = (diff * diff).sum(axis=1)
        top = np.lexsort((ids[cand], adc))[:rerank]
        cand_lists.append((int(qi), cand[top]))
    rec_of(
        "similarity_pq_ivf",
        method,
        spark_rows("similarity_pq_ivf"),
        _np_topk(ids, q, nn, cand_lists),
    )

    # ---- DuckDB micro-slice over staged artifacts --------------------------
    print("duckdb micro-slice...", flush=True)
    try:
        micro = _duck_micro(
            sf_dir, ids, q, nn, assign, cents, live, bands, c8, n8,
            qidx[::MICRO_STRIDE], rerank, pqc,
        )
        for name, ok in micro.items():
            out[name]["duck_micro_slice_match"] = ok
            print(f"  micro {name}: {ok}", flush=True)
    except Exception:  # noqa: BLE001
        err = traceback.format_exc(limit=3)
        print(f"ERROR duck micro-slice:\n{err}", flush=True)
        for name in out:
            out[name].setdefault("duck_micro_slice_err", err)

    # ---- merge into the shared recheck artifact ----------------------------
    path = os.environ.get(
        "RECHECK_OUT",
        os.path.join(REPO, "CORRECTNESS_sf100_recheck.json"),
    )
    if not selftest:
        merged = out
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f)
            prior_specs = prior.get("specs", prior)
            prior_specs.update(out)
            merged = prior_specs
        tmp = path + ".tmp"  # atomic: never tear the committed artifact
        with open(tmp, "w") as f:
            json.dump({"sf_dir": sf_dir, "specs": merged}, f, indent=1)
        os.replace(tmp, path)
    n_bad = sum(
        1 for r in out.values()
        if r["err"] or r.get("hash_match") is not True
        or r.get("duck_micro_slice_match") is False
        or any(v is False for k, v in r.items() if k.startswith("full_"))
    )
    print(f"\nsf100_ann_recheck: {len(out)} specs, {n_bad} not exact"
          + ("" if selftest else f" -> {path}"))
    spark.stop()
    return 1 if n_bad else 0


def _duck_micro(sf_dir, ids, q, nn, assign, cents, live, bands, c8, n8,
                micro_idx, rerank, pqc) -> dict[str, bool]:
    """SQL recomputation of candidate -> score -> top-10 for the micro
    queries, over the numpy-staged artifacts (third engine for the
    arithmetic): exact int64 dots via a (vec, dim) unnest join, the
    spec's own cosine text, rank by (cosine DESC, neighbor_id)."""
    from gcp_dbt_data_engineering_spark.operators.similarity import (
        FLAT_PROBE,
        PQ_PROBE,
        SQ8_PROBE,
        TOP_K,
    )

    import pyarrow as pa

    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    # bounded spill: fail the micro check rather than fill the disk
    con.execute("SET temp_directory='/tmp/duckdb_micro_spill'")
    con.execute("SET max_temp_directory_size='30GB'")
    micro_set = set(int(ids[i]) for i in micro_idx)

    def _fsl(mat: np.ndarray):
        return pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(mat).reshape(-1)), mat.shape[1]
        )

    vecs_tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "q": _fsl(q),
            "nn": pa.array(nn),
            "cid": pa.array(assign),
            "c8": _fsl(c8),
            "n8": pa.array(n8),
            "pqc": _fsl(pqc),
        }
    )
    con.register("vecs", vecs_tbl)
    con.register(
        "queries", pa.table({"query_id": pa.array(sorted(micro_set))})
    )
    cos = (
        "CAST(list_reduce(list_transform(generate_series(1, 64),"
        " i -> a.q[i] * b.q[i]), (x, y) -> x + y) AS DOUBLE)"
        " / (sqrt(CAST(a.nn AS DOUBLE)) * sqrt(CAST(b.nn AS DOUBLE)))"
    )
    results: dict[str, bool] = {}

    def top10(cand_sql: str) -> list[tuple]:
        return con.execute(f"""
WITH cand AS ({cand_sql}),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {cos} AS cosine
  FROM cand c
  JOIN vecs a ON a.vec_id = c.query_id
  JOIN vecs b ON b.vec_id = c.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""").fetchall()

    def np_reference(name_cands) -> list[tuple]:
        rows = _np_topk(ids, q, nn, name_cands)
        return sorted(rows, key=lambda r: (r[0], r[2]))

    # lsh: candidates share >= 1 band key (the full band-key relation,
    # ~n*56 rows, staged zero-copy via arrow)
    n_b = bands.shape[1]
    con.register(
        "chunks",
        pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, n_b)),
                "c": pa.array(np.tile(np.arange(n_b, dtype=np.int64),
                                      len(ids))),
                "ck": pa.array(np.ascontiguousarray(bands).reshape(-1)),
            }
        ),
    )
    lsh_rows = top10(f"""
  SELECT DISTINCT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
  FROM chunks qc
  JOIN queries ON qc.vec_id = queries.query_id
  JOIN chunks cc ON qc.c = cc.c AND qc.ck = cc.ck
  WHERE cc.vec_id <> qc.vec_id""")
    idx_of = {int(v): i for i, v in enumerate(ids.tolist())}
    bucket: dict[tuple[int, int], list[int]] = {}
    for c in range(bands.shape[1]):
        for i, k in enumerate(bands[:, c].tolist()):
            bucket.setdefault((c, k), []).append(i)
    ref_cands = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        cs: set[int] = set()
        for c in range(bands.shape[1]):
            cs.update(bucket.get((c, int(bands[qi, c])), ()))
        cs.discard(qi)
        ref_cands.append((qi, np.fromiter(cs, dtype=np.int64)))
    results["similarity_ann_lsh"] = lsh_rows == np_reference(ref_cands)

    # ivf-flat: candidates in the FLAT_PROBE nearest cells
    cnn = (cents * cents).sum(axis=1)
    probe_rows = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        for cid in live[np.lexsort((live, d2))[:FLAT_PROBE]]:
            probe_rows.append((qid, int(cid)))
    con.register(
        "probes",
        __import__("pandas").DataFrame(
            probe_rows, columns=["query_id", "cid"]
        ),
    )
    ivf_rows = top10("""
  SELECT p.query_id, v.vec_id AS neighbor_id
  FROM probes p JOIN vecs v ON v.cid = p.cid
  WHERE v.vec_id <> p.query_id""")
    ref_cands = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        cells = live[np.lexsort((live, d2))[:FLAT_PROBE]]
        cand = np.where(np.isin(assign, cells))[0]
        cand = cand[cand != qi]
        ref_cands.append((qi, cand))
    results["similarity_ann_ivf"] = ivf_rows == np_reference(ref_cands)

    # ivf-sq8: compressed rank in SQL over staged codes, then exact top-10
    probe_rows = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        for cid in live[np.lexsort((live, d2))[:SQ8_PROBE]]:
            probe_rows.append((qid, int(cid)))
    con.register(
        "probes8",
        __import__("pandas").DataFrame(
            probe_rows, columns=["query_id", "cid"]
        ),
    )
    sq8_rows = top10(f"""
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, v.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
             CAST(list_reduce(list_transform(generate_series(1, 64),
               i -> a.c8[i] * v.c8[i]), (x, y) -> x + y) AS DOUBLE)
             / (sqrt(CAST(a.n8 AS DOUBLE)) * sqrt(CAST(v.n8 AS DOUBLE)))
             DESC, v.vec_id) AS prn
    FROM probes8 p
    JOIN vecs a ON a.vec_id = p.query_id
    JOIN vecs v ON v.cid = p.cid
    WHERE v.vec_id <> p.query_id)
  WHERE prn <= {rerank}""")
    ref_cands = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        cells = live[np.lexsort((live, d2))[:SQ8_PROBE]]
        cand = np.where(np.isin(assign, cells))[0]
        cand = cand[cand != qi]
        s8 = (c8[cand] @ c8[qi]).astype(np.float64) / (
            np.sqrt(np.float64(n8[qi]))
            * np.sqrt(n8[cand].astype(np.float64))
        )
        top = np.lexsort((ids[cand], -s8))[:rerank]
        ref_cands.append((qi, cand[top]))
    results["similarity_ann_ivf_kmeans"] = (
        sq8_rows == np_reference(ref_cands)
    )

    # ivf-pq: integer ADC rank in SQL over the staged reconstruction
    # centers (third engine for the asymmetric distance), exact top-10
    probe_rows = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        for cid in live[np.lexsort((live, d2))[:PQ_PROBE]]:
            probe_rows.append((qid, int(cid)))
    con.register(
        "probespq",
        __import__("pandas").DataFrame(
            probe_rows, columns=["query_id", "cid"]
        ),
    )
    pq_rows = top10(f"""
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, v.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
             list_reduce(list_transform(generate_series(1, 64),
               i -> (a.q[i] - v.pqc[i]) * (a.q[i] - v.pqc[i])),
               (x, y) -> x + y) ASC, v.vec_id) AS prn
    FROM probespq p
    JOIN vecs a ON a.vec_id = p.query_id
    JOIN vecs v ON v.cid = p.cid
    WHERE v.vec_id <> p.query_id)
  WHERE prn <= {rerank}""")
    ref_cands = []
    for qid in sorted(micro_set):
        qi = idx_of[qid]
        d2 = nn[qi] - 2 * (cents @ q[qi]) + cnn
        cells = live[np.lexsort((live, d2))[:PQ_PROBE]]
        cand = np.where(np.isin(assign, cells))[0]
        cand = cand[cand != qi]
        diff = pqc[cand] - q[qi]
        adc = (diff * diff).sum(axis=1)
        top = np.lexsort((ids[cand], adc))[:rerank]
        ref_cands.append((qi, cand[top]))
    results["similarity_pq_ivf"] = pq_rows == np_reference(ref_cands)
    return results


if __name__ == "__main__":
    raise SystemExit(main())
