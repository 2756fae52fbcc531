"""Exact rechecks at sf10 for the six specs whose FULL DuckDB oracles
are intractable there (VERDICT r7 item 1).

The intractability is always the oracle's naive candidate generation
(a hot-shingle inverted-index self-join producing ~5.4e9 rows at sf10,
or a 2000x200k brute-force cosine grid) — never the Spark plan, whose
output row counts track the sf1 slope. Three honest exact methods
replace the full-output hash:

- **sliced-exact (pair specs)**: the Spark spec runs IN FULL; its
  output is filtered to pairs touching a deterministic 1% doc slice
  (doc_id % 100 == 0), and a restricted oracle computes exactly those
  pairs (two UNION ALL branches, each with one join side sliced, so
  the hot-shingle blowup drops 100x). Hashes compare exactly on the
  slice.
- **sliced-exact (ANN specs)**: same, slicing the query side to every
  10th query (vec_id % 1000 == 0); the oracle replays the full
  corpus-side computation for those queries.
- **staged-exact (closure specs)**: the component/keep decisions are
  deterministic functions of the near-dup EDGE relation. The edge
  relation is dedup_ngram_jaccard's output — slice-verified at sf10
  (above) and fully hash-verified at sf1 and below. A pure-Python
  union-find (an independent implementation: different algorithm,
  different engine) recomputes the FULL component/keep output from
  the Spark edge list + a linear DuckDB per-doc shingle count, and
  the complete outputs compare exactly.

Writes CORRECTNESS_sf10_recheck.json. Merge into CORRECTNESS_sf10.json
with tools/merge_sf10.py.

Run:  python tools/sf10_recheck.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import traceback
from typing import Any

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from correctness_full import _canon, _sha  # noqa: E402

#: deterministic 1% doc slice for pair specs
PAIR_MOD = 100
#: every-10th-query slice for ANN specs (queries are vec_id % 100 == 0)
QUERY_MOD_SLICED = 1000


def _cmp(rec: dict, s_cols, s_rows, d_cols, d_rows) -> None:
    rec["spark_rows"] = len(s_rows)
    rec["oracle_rows"] = len(d_rows)
    rec["rows_match"] = len(s_rows) == len(d_rows)
    rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
    s_canon = _canon(list(s_cols), s_rows)
    d_canon = _canon(list(d_cols), d_rows)
    rec["hash_match"] = s_canon == d_canon
    rec["spark_sha"] = _sha(s_canon)
    rec["oracle_sha"] = _sha(d_canon)
    if not rec["hash_match"]:
        rec["first_diff"] = next(
            (
                {"spark": repr(a)[:200], "duck": repr(b)[:200]}
                for a, b in zip(s_canon, d_canon)
                if a != b
            ),
            None,
        )


def _sliced_pair_oracles() -> dict[str, str]:
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        CONTAIN_T_DEN,
        CONTAIN_T_NUM,
        JACCARD_T,
        _sql_shingle_cte,
    )

    cte = _sql_shingle_cte()
    jac = f"""
WITH {cte},
ssh AS MATERIALIZED (SELECT * FROM sh WHERE doc_id % {PAIR_MOD} = 0),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ssh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM sh a JOIN ssh b ON a.h = b.h AND a.doc_id < b.doc_id
  WHERE a.doc_id % {PAIR_MOD} <> 0),
inter AS (SELECT doc_a, doc_b, COUNT(*) AS i FROM cand GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sz x ON doc_a = x.doc_id
JOIN sz y ON doc_b = y.doc_id
WHERE CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) >= {JACCARD_T}
"""
    con = f"""
WITH {cte},
ssh AS MATERIALIZED (SELECT * FROM sh WHERE doc_id % {PAIR_MOD} = 0),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ssh a JOIN sh b ON a.h = b.h AND a.doc_id != b.doc_id
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM sh a JOIN ssh b ON a.h = b.h AND a.doc_id != b.doc_id
  WHERE a.doc_id % {PAIR_MOD} <> 0),
inter AS (SELECT doc_a, doc_b, COUNT(*) AS i FROM cand GROUP BY 1, 2)
SELECT doc_a AS contained_doc, doc_b AS container_doc,
       CAST(i AS DOUBLE) / CAST(x.n AS DOUBLE) AS containment
FROM inter
JOIN sz x ON doc_a = x.doc_id
WHERE {CONTAIN_T_DEN} * i >= {CONTAIN_T_NUM} * x.n
"""
    return {"dedup_ngram_jaccard": jac, "dedup_containment": con}


def _lsh_chunks_table(con) -> None:
    """Materialize the 448-plane LSH band keys into chunks_t in 8
    modular vec_id passes. The relational sign computation (qdim x wt
    -> 64*448 joined rows per vector) is 5.7e9 intermediate rows at
    sf10 and its hash aggregate spilled past a 40 GB temp budget in
    one statement; per-vector groups are disjoint under a modular
    split, so 8 passes are exactly equivalent and bound the spill."""
    import gcp_dbt_data_engineering_spark.operators.similarity as sim

    have = {
        r[0]
        for r in con.execute(
            "SELECT table_name FROM information_schema.tables"
        ).fetchall()
    }
    if "chunks_t" in have:
        return
    con.execute("CREATE TABLE chunks_t (vec_id BIGINT, c BIGINT, ck BIGINT)")
    # _SQL_CHUNKS ends at the chunks CTE; qn comes from _SQL_QUANTIZED
    for r in range(8):
        # subquery wrap: INSERT INTO ... WITH <materialized ctes>
        # trips DuckDB's binder ("Duplicate alias"); the same WITH
        # inside a FROM-subquery binds fine
        con.execute(f"""INSERT INTO chunks_t SELECT * FROM (
WITH {sim._SQL_QUANTIZED},
{sim._SQL_CHUNKS.replace("FROM qn)", f"FROM qn WHERE vec_id % 8 = {r})", 1)}
SELECT vec_id, c, ck FROM chunks)""")


def _sliced_ann_oracles() -> dict[str, str]:
    import gcp_dbt_data_engineering_spark.operators.similarity as sim

    out = {}
    for name, oracle, pats in (
        ("similarity_topk_cosine", sim.ORACLE_TOPK_COSINE,
         (f"a.vec_id % {sim.QUERY_MOD} = 0",)),
        ("similarity_ann_lsh", sim.ORACLE_ANN_LSH,
         (f"a.vec_id % {sim.QUERY_MOD} = 0",)),
        ("similarity_pq_adc", sim.ORACLE_PQ_ADC,
         (f"qq.vec_id % {sim.QUERY_MOD} = 0",)),
        # the r9 trained-IVF oracles filter queries in TWO CTEs (qrys
        # and the probe l2q); the bare pattern substring-matches both,
        # and str.replace rewrites every site so probe set and re-rank
        # set shrink together
        ("similarity_ann_ivf", sim.ORACLE_ANN_IVF,
         (f"vec_id % {sim.QUERY_MOD} = 0",)),
        ("similarity_ann_ivf_kmeans", sim.ORACLE_ANN_IVF_KMEANS,
         (f"vec_id % {sim.QUERY_MOD} = 0",)),
        # r11 IVF-PQ: same two-CTE filter structure as the IVF
        # oracles (qrys + the probe l2q); the ADC re-rank budget is a
        # corpus count (FROM qn), untouched by query slicing
        ("similarity_pq_ivf", sim.ORACLE_PQ_IVF,
         (f"vec_id % {sim.QUERY_MOD} = 0",)),
    ):
        sliced = oracle
        for pat in pats:
            assert pat in sliced, (name, pat)
            sliced = sliced.replace(
                pat,
                pat.replace(f"% {sim.QUERY_MOD}", f"% {QUERY_MOD_SLICED}"),
            )
        assert f"% {QUERY_MOD_SLICED} = 0" in sliced, name
        assert f"% {sim.QUERY_MOD} = 0" not in sliced, name
        if name == "similarity_ann_lsh":
            # read the staged band keys (_lsh_chunks_table) instead of
            # recomputing them inline — the inline form spilled > 40 GB
            assert sim._SQL_CHUNKS in sliced
            sliced = sliced.replace(
                sim._SQL_CHUNKS,
                "\nchunks AS (SELECT * FROM chunks_t)",
            )
        out[name] = sliced
    return out


def _sliced_embedding_cosine() -> str:
    """Pairs touching vec_id % PAIR_MOD == 0, two one-side-sliced
    branches so the within-label blowup drops 100x."""
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        ORACLE_EMBEDDING_COSINE,
    )

    # reuse the original q/n CTEs and final SELECT verbatim; only the
    # d CTE's self-join is rebuilt as two one-side-sliced branches
    head, rest = ORACLE_EMBEDDING_COSINE.split("d AS (")
    proj = rest.split("FROM n a")[0].strip()
    tail = "SELECT vec_a" + ORACLE_EMBEDDING_COSINE.rsplit(
        "SELECT vec_a", 1
    )[1]
    on = "ON a.label = b.label AND a.vec_id < b.vec_id"
    return (
        head
        + f"""ns AS MATERIALIZED (
  SELECT * FROM n WHERE vec_id % {PAIR_MOD} = 0),
d AS (
  {proj} FROM ns a JOIN n b {on}
  UNION ALL
  {proj} FROM n a JOIN ns b {on}
  WHERE a.vec_id % {PAIR_MOD} <> 0)
"""
        + tail
    )


def _sliced_semantic() -> str:
    """Cluster fit/assign replay in FULL (linear); the quadratic
    within-cluster pair stage restricted to verdicts for
    vec_id % PAIR_MOD == 0 (a vec's status depends only on pairs where
    it is the larger endpoint, so slicing the y side is exact)."""
    from gcp_dbt_data_engineering_spark.operators.semdedup import (
        ORACLE_SEMANTIC,
    )

    j = "ON x.cid = y.cid AND x.vec_id < y.vec_id"
    assert j in ORACLE_SEMANTIC
    sliced = ORACLE_SEMANTIC.replace(
        j, j + f" AND y.vec_id % {PAIR_MOD} = 0"
    )
    return sliced.rstrip() + f"\nWHERE m.vec_id % {PAIR_MOD} = 0\n"


def _sliced_phash() -> str:
    """Rebuilt from the same building blocks as multimodal._oracle_phash
    but with the 16x4-bit chunk self-join split into two one-side-sliced
    branches (each 1/PAIR_MOD of the full blowup — the full join is
    n^2/16 per chunk, intractable at sf10)."""
    from gcp_dbt_data_engineering_spark.operators.multimodal import (
        PHASH_CHUNKS,
        PHASH_HAM_T,
        _phash_words,
    )

    w1, w2 = _phash_words("text", "duck")
    chunk_rows = " UNION ALL ".join(
        f"SELECT asset_id, w1, w2, {c} AS chunk,"
        f" CAST((w{1 + c // 8} // {1 << (4 * (c % 8))}) % 16 AS INTEGER)"
        " AS v FROM hashed"
        for c in range(PHASH_CHUNKS)
    )
    pair = (
        "SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,"
        " CAST(bit_count(xor(a.w1, b.w1)) + bit_count(xor(a.w2, b.w2))"
        " AS INTEGER) AS hamming"
    )
    on = "ON a.chunk = b.chunk AND a.v = b.v AND a.asset_id < b.asset_id"
    return f"""
WITH hashed AS (
  SELECT doc_id AS asset_id, {w1} AS w1, {w2} AS w2
  FROM documents WHERE length(text) >= 2),
chunks AS MATERIALIZED ({chunk_rows}),
schunks AS MATERIALIZED (
  SELECT * FROM chunks WHERE asset_id % {PAIR_MOD} = 0),
cand AS (
  {pair} FROM schunks a JOIN chunks b {on}
  UNION ALL
  {pair} FROM chunks a JOIN schunks b {on}
  WHERE a.asset_id % {PAIR_MOD} <> 0)
SELECT DISTINCT asset_a, asset_b, hamming
FROM cand WHERE hamming <= {PHASH_HAM_T}
"""


class _UF:
    """Union-find — independent closure oracle (vs Spark's iterative
    min-label propagation)."""

    def __init__(self) -> None:
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.p
        r = x
        while p.get(r, r) != r:
            r = p[r]
        while p.get(x, x) != x:
            p[x], x = r, p[x]
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical label = min doc_id, matching the spec contract
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def _python_closure(
    edges: list[tuple[int, int]], doc_ids: list[int]
) -> dict[int, int]:
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    return {d: uf.find(d) for d in doc_ids}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.artifacts/sf10"

    from gcp_dbt_data_engineering_spark import get_spark
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        SPECS as DSPECS,
        _jaccard_pair_list,
        _sql_shingle_cte,
    )
    from gcp_dbt_data_engineering_spark.operators.similarity import (
        SPECS as SIMSPECS,
    )
    from gcp_dbt_data_engineering_spark.sources import TABLES, table_path

    spark = get_spark(app_name="sf10_recheck")
    con = duckdb.connect()
    con.execute(
        "SET memory_limit = "
        f"'{os.environ.get('DUCKDB_MEMORY_LIMIT', '32GB')}'"
    )
    con.execute("SET temp_directory = '/tmp/duckdb_spill_recheck'")
    con.execute("SET max_temp_directory_size = '40GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    _lsh_chunks_table(con)

    out: dict[str, dict] = {}
    # RECHECK_ONLY='regex' re-runs a subset; results merge into the
    # existing artifact (everything is lazy until run() collects, so
    # skipped specs cost nothing)
    only = os.environ.get("RECHECK_ONLY")
    only_rx = re.compile(only) if only else None

    def run(name, method, spark_df, oracle_sql=None, oracle_rows=None,
            oracle_cols=None):
        if only_rx is not None and not only_rx.search(name):
            print(f"SKIP  {name} (RECHECK_ONLY)")
            return
        rec: dict[str, Any] = {"method": method, "err": None}
        try:
            s_cols = spark_df.columns
            s_rows = [tuple(r) for r in spark_df.collect()]
            if oracle_sql is not None:
                cur = con.execute(oracle_sql)
                d_cols = [d[0] for d in cur.description]
                d_rows = cur.fetchall()
            else:
                d_cols, d_rows = oracle_cols, oracle_rows
            _cmp(rec, s_cols, s_rows, d_cols, d_rows)
            ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            print(f"{'PASS ' if ok else 'FAIL*'} {name} [{method}]: "
                  f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}")
            if not ok and rec.get("first_diff"):
                print(f"      first_diff: {rec['first_diff']}")
        except Exception:  # noqa: BLE001
            rec["err"] = traceback.format_exc(limit=3)
            print(f"ERROR {name}:\n{rec['err']}")
        out[name] = rec

    # --- sliced pair specs -------------------------------------------------
    po = _sliced_pair_oracles()
    jac_full = DSPECS["dedup_ngram_jaccard"].spark(spark, sf_dir)
    run(
        "dedup_ngram_jaccard",
        f"sliced-exact: full Spark output filtered to pairs touching "
        f"doc_id % {PAIR_MOD} == 0; restricted oracle computes exactly "
        f"those pairs",
        jac_full.filter(
            f"doc_a % {PAIR_MOD} = 0 OR doc_b % {PAIR_MOD} = 0"
        ),
        oracle_sql=po["dedup_ngram_jaccard"],
    )
    run(
        "dedup_containment",
        f"sliced-exact: pairs touching doc_id % {PAIR_MOD} == 0",
        DSPECS["dedup_containment"].spark(spark, sf_dir).filter(
            f"contained_doc % {PAIR_MOD} = 0"
            f" OR container_doc % {PAIR_MOD} = 0"
        ),
        oracle_sql=po["dedup_containment"],
    )

    # --- sliced ANN specs --------------------------------------------------
    ao = _sliced_ann_oracles()
    for name in (
        "similarity_topk_cosine",
        "similarity_ann_lsh",
        "similarity_pq_adc",
        "similarity_ann_ivf",
        "similarity_ann_ivf_kmeans",
        "similarity_pq_ivf",
    ):
        run(
            name,
            f"sliced-exact: full Spark output filtered to query_id % "
            f"{QUERY_MOD_SLICED} == 0; oracle replays the full corpus "
            f"side for those queries",
            SIMSPECS[name].spark(spark, sf_dir).filter(
                f"query_id % {QUERY_MOD_SLICED} = 0"
            ),
            oracle_sql=ao[name],
        )

    # --- sliced quadratic pair specs (embedding / semantic / phash) -------
    from gcp_dbt_data_engineering_spark.operators.semdedup import (
        SPECS as SEMSPECS,
    )

    run(
        "dedup_embedding_cosine",
        f"sliced-exact: pairs touching vec_id % {PAIR_MOD} == 0 "
        f"(two one-side-sliced within-label branches)",
        DSPECS["dedup_embedding_cosine"].spark(spark, sf_dir).filter(
            f"vec_a % {PAIR_MOD} = 0 OR vec_b % {PAIR_MOD} = 0"
        ),
        oracle_sql=_sliced_embedding_cosine(),
    )
    run(
        "dedup_semantic",
        f"sliced-exact: k-means fit/assign replayed in FULL (linear); "
        f"per-vector verdicts checked for vec_id % {PAIR_MOD} == 0 "
        f"(a verdict depends only on pairs where the vec is the larger "
        f"endpoint, so slicing the y side is exact)",
        SEMSPECS["dedup_semantic"].spark(spark, sf_dir).filter(
            f"vec_id % {PAIR_MOD} = 0"
        ),
        oracle_sql=_sliced_semantic(),
    )
    # phash: BOTH engines evaluate one-side-sliced branches built from
    # the spec's own expressions (_phash_chunk_frame/_phash_pairs). An
    # OR-of-both-endpoints filter cannot be pushed through a self-join
    # in either engine, and the unrestricted candidate stream is the
    # documented ~2.5e11-row saturation at sf10 (multimodal.py
    # docstring) — the full Spark run is CPU-intractable on this box
    # (>85 min at 15 cores before we stopped it, r8), so the spec's
    # sf10 evidence is this sliced-exact check alone; full-output
    # hashes exist at sf <= 1.
    from gcp_dbt_data_engineering_spark.operators.multimodal import (
        _phash_chunk_frame,
        _phash_pairs,
    )

    chunks = _phash_chunk_frame(spark, sf_dir)
    sliced = chunks.filter(f"asset_id % {PAIR_MOD} = 0")
    phash_sliced = _phash_pairs(sliced, chunks).unionByName(
        _phash_pairs(
            chunks.filter(f"asset_id % {PAIR_MOD} <> 0"), sliced
        )
    ).distinct()
    run(
        "multimodal_phash_near_dup",
        f"sliced-exact: pairs touching asset_id % {PAIR_MOD} == 0, "
        f"one-side-sliced chunk-join branches built from the spec's "
        f"own chunk/verify expressions in BOTH engines (full run is "
        f"CPU-intractable at sf10: ~2.5e11 candidate rows)",
        phash_sliced,
        oracle_sql=_sliced_phash(),
    )

    # --- staged closure specs ---------------------------------------------
    edges = [
        (r.doc_a, r.doc_b)
        for r in _jaccard_pair_list(spark, sf_dir).collect()
    ]
    doc_ids = [
        r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()
    ]
    labels = _python_closure(edges, doc_ids)
    staged_note = (
        "staged-exact: FULL output vs python union-find over the Spark "
        "edge relation (edge logic slice-verified above at this sf and "
        "fully hash-verified at sf<=1) "
    )

    comp: dict[int, dict] = {}
    for d, lab in labels.items():
        c = comp.setdefault(lab, {"n": 0, "mx": d})
        c["n"] += 1
        c["mx"] = max(c["mx"], d)
    cc_rows = [(k, v["n"], v["mx"]) for k, v in comp.items()]
    run(
        "dedup_cluster_components",
        staged_note + "+ per-component count/max fold",
        DSPECS["dedup_cluster_components"].spark(spark, sf_dir),
        oracle_rows=cc_rows,
        oracle_cols=["component_id", "n_docs", "max_doc"],
    )

    sz = dict(
        con.execute(
            f"WITH {_sql_shingle_cte()} SELECT doc_id, n FROM sz"
        ).fetchall()
    )
    best: dict[int, dict] = {}
    for d, lab in labels.items():
        n = sz.get(d, 0)
        c = best.setdefault(lab, {"n_docs": 0, "key": None})
        c["n_docs"] += 1
        k = (n, -d)
        if c["key"] is None or k > c["key"]:
            c["key"] = k
    kb_rows = [
        (lab, c["n_docs"], -c["key"][1], c["key"][0], c["n_docs"] - 1)
        for lab, c in best.items()
    ]
    run(
        "dedup_keep_best",
        staged_note + "+ linear DuckDB shingle counts + python argmax",
        DSPECS["dedup_keep_best"].spark(spark, sf_dir),
        oracle_rows=kb_rows,
        oracle_cols=[
            "component_id", "n_docs", "keep_doc", "keep_n_shingles",
            "n_dropped",
        ],
    )

    # --- staged pagerank ----------------------------------------------------
    # The full DuckDB oracle is disk-intractable at sf10 (the jaccard
    # candidate CTE spills > 56 GB even at a 40 GB memory budget).
    # The spec's output is a deterministic function of the edge
    # relation (slice-verified above; fully verified at sf <= 1):
    # contributions are integer-quantized (FLOOR(r/deg * 1e12)) so the
    # per-destination sum is order-free, and every remaining op is a
    # fixed IEEE double sequence — a pure-Python power iteration
    # reproduces the FULL output bit-for-bit.
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        PR_DAMP,
        PR_ITERS,
        PR_SCALE,
    )

    adj = [e for a, b in edges for e in ((a, b), (b, a))]
    degs: dict[int, int] = {}
    for s, _ in adj:
        degs[s] = degs.get(s, 0) + 1
    n_docs = len(doc_ids)
    rank = {d: 1.0 / n_docs for d in doc_ids}
    base = 0.15 / n_docs
    for _ in range(PR_ITERS):
        cs: dict[int, int] = {}
        for s, dst in adj:
            c = math.floor(rank[s] / degs[s] * float(PR_SCALE))
            cs[dst] = cs.get(dst, 0) + c
        rank = {
            d: base + PR_DAMP * (float(cs.get(d, 0)) / float(PR_SCALE))
            for d in doc_ids
        }
    run(
        "dedup_graph_pagerank",
        staged_note + "+ python 3-iteration power iteration "
        "(integer-quantized contributions -> order-free sums)",
        DSPECS["dedup_graph_pagerank"].spark(spark, sf_dir),
        oracle_rows=[(d, rank[d]) for d in doc_ids],
        oracle_cols=["doc_id", "pagerank"],
    )

    path = os.path.join(REPO, "CORRECTNESS_sf10_recheck.json")
    if only_rx is not None and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("specs", {})
        prior.update(out)
        out = prior
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "specs": out}, f, indent=1)
    n_bad = sum(
        1 for r in out.values() if r["err"] or r.get("hash_match") is not True
    )
    print(f"\nsf10_recheck: {len(out)} specs, {n_bad} not exact -> {path}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
