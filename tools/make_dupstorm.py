"""Build the duplicate-storm corpus for the robustness sweep (wave 8).

Every large web/crawl corpus is boilerplate-heavy: cookie banners,
license headers and templated pages appear verbatim thousands of
times, and near-verbatim (one-token edits) thousands more. None of
the earlier adversarial corpora model this: the nasty corpus injects
a handful of dup rows, the skew corpus skews a GROUP key, but no
corpus makes one CONTENT dominate. A dup-storm is the pathology that
turns bucketed algorithms quadratic: every copy of the boilerplate
lands in the SAME MinHash/SimHash/sign-LSH bucket, the near-dup graph
grows a dense clique, k-means gets a point mass, and top-k similarity
sees hundreds of exact cosine-1.0 ties.

Injected on top of a copied sf dir (all other tables byte-identical):

documents (doc_id >= 920000):
  - 300 VERBATIM copies of one ~40-word boilerplate text under
    distinct ids (the corpus is 500 base docs, so one content is now
    ~37% of the table) — exact-dedup group of 301, a single LSH
    bucket with ~300 members (~45k within-bucket pairs per band),
    a 301-clique in the near-dup graph (connected components,
    PageRank, keep-best tie-breaks).
  - 100 ONE-TOKEN EDITS of the boilerplate (word i -> 'tokI'):
    high-Jaccard near-dup ring around the clique, PPJoin prefix
    filtering at Jaccard ~0.9, banding collision bait.
  - base docs 1..30 each duplicated 10x: many MEDIUM dup groups, the
    group-size distribution a real dedup pass sees.

embeddings (vec_id >= 920000):
  - 300 verbatim copies of vec 0's embedding: one IVF cell / LSH
    bucket absorbs 300 identical points; qmod picks some copies as
    QUERIES, so top-k must break hundreds of exact cosine-1.0 ties
    deterministically; k-means trains against a point mass.
  - 100 near-copies (one coordinate nudged by i*2e-3): a tight
    cluster just off the mass point — centroid separation and
    re-rank boundaries at near-zero distances.

orders (o_orderkey >= 920000):
  - 3000 extra valid orders ALL for o_custkey 1 (~17% of the table):
    a hot customer key through every window partition, cohort/LTV
    rollup and revenue group-by — the key-skew class the domain-skew
    corpus only covered for documents.

The oracles stay exact by construction — DuckDB reads the same
injected parquet. Anything that crashes, times out, or
hash-mismatches here is a genuine dup-robustness defect (tie-break
nondeterminism, bucket-pair explosion, centroid collapse, skew
stragglers) — the class a clean uniform corpus never shows.

Run:  python tools/make_dupstorm.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOILER = (
    "this website uses cookies to ensure you get the best experience "
    "on our website by continuing to browse the site you are agreeing "
    "to our use of cookies and our privacy policy please review the "
    "terms of service before proceeding to the requested page"
)

N_VERBATIM = 300   # copies of the boilerplate
N_NEARDUP = 100    # one-token edits of the boilerplate
N_MEDIUM = 30      # base docs duplicated...
MEDIUM_COPIES = 10  # ...this many times each
N_HOT_ORDERS = 3000


def doc_rows() -> list[tuple[int, str, str, str]]:
    rows: list[tuple[int, str, str, str]] = []
    for i in range(N_VERBATIM):
        rows.append((920000 + i, BOILER, "en", f"boiler{i % 7}.net"))
    words = BOILER.split(" ")
    for i in range(N_NEARDUP):
        w = list(words)
        w[i % len(w)] = f"tok{i}"
        rows.append((920300 + i, " ".join(w), "en", "boiler0.net"))
    return rows


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".artifacts", "sf0.01_dupstorm")
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        s, d = os.path.join(src, f), os.path.join(dst, f)
        if f == "documents.parquet":
            con.execute(
                "CREATE OR REPLACE TEMP TABLE inj(doc_id BIGINT, "
                "text VARCHAR, lang VARCHAR, source VARCHAR)"
            )
            con.executemany(
                "INSERT INTO inj VALUES (?, ?, ?, ?)", doc_rows()
            )
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  SELECT doc_id, text, lang, source, length(text)
                  FROM inj
                  UNION ALL
                  -- medium dup groups: base docs 1..{N_MEDIUM} x{MEDIUM_COPIES}
                  SELECT 920400 + (b.doc_id - 1) * {MEDIUM_COPIES} + c.i,
                         b.text, b.lang, 'mirror' || (c.i % 3) || '.org',
                         b.n_chars
                  FROM read_parquet('{s}') b,
                       (SELECT unnest(range({MEDIUM_COPIES})) AS i) c
                  WHERE b.doc_id BETWEEN 1 AND {N_MEDIUM}
                  ORDER BY doc_id
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        elif f == "embeddings.parquet":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  -- 300 verbatim copies of vec 0 (the mass point)
                  SELECT 920000 + c.i, b.embedding, c.i % 10
                  FROM read_parquet('{s}') b,
                       (SELECT unnest(range({N_VERBATIM})) AS i) c
                  WHERE b.vec_id = 0
                  UNION ALL
                  -- 100 near-copies: coordinate (i % 64) nudged by
                  -- (i+1)*2e-3 — a tight shell around the mass point
                  SELECT 920300 + n.i,
                         list_transform(range(64), j ->
                           CAST(e.embedding[j + 1] +
                                CASE WHEN j = n.i % 64
                                     THEN (n.i + 1) * 2e-3
                                     ELSE 0 END AS FLOAT)),
                         n.i % 10
                  FROM read_parquet('{s}') e,
                       (SELECT unnest(range({N_NEARDUP})) AS i) n
                  WHERE e.vec_id = 0
                  ORDER BY 1
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        elif f == "orders.parquet":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  -- hot customer: 3000 extra valid orders for custkey 1,
                  -- dates cycling one year, prices deterministic
                  SELECT 920000 + c.i, 1,
                         CASE c.i % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O'
                              ELSE 'P' END,
                         ROUND(50.0 + (c.i % 997) * 13.37, 2),
                         TIMESTAMP '1997-01-01 00:00:00'
                           + INTERVAL ((c.i % 365)) DAY,
                         CASE c.i % 5 WHEN 0 THEN '1-URGENT'
                              WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM'
                              WHEN 3 THEN '4-NOT SPECIFIED'
                              ELSE '5-LOW' END
                  FROM (SELECT unnest(range({N_HOT_ORDERS})) AS i) c
                  ORDER BY 1
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(s, d)
        print(f"{f} -> {d}", flush=True)
    con.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
