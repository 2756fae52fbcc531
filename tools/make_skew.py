"""Build the skewed-hot-domain corpus for the robustness sweep
(VERDICT r7 item 5).

Copies an sf dir and rewrites documents.parquet so that ONE source
domain ('src_hot') holds 50% of all documents (every even doc_id).
Text, ids, and every other table are byte-identical — only the domain
key distribution changes, so the hot-key stress lands exactly on the
group-bys, caps, and per-domain windows that key on `source`
(curate_corpus_funnel, sample_domain_caps, token_budget_select, ...)
while every oracle stays exact: DuckDB reads the same skewed parquet.

Run:  python tools/make_skew.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".artifacts", "sf0.01_skew")
    )
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        s, d = os.path.join(src, f), os.path.join(dst, f)
        if f == "documents.parquet":
            duckdb.sql(
                f"""
                COPY (
                  SELECT doc_id, text, lang,
                         CASE WHEN doc_id % 2 = 0
                              THEN 'src_hot' ELSE source END AS source,
                         n_chars
                  FROM read_parquet('{s}')
                  ORDER BY doc_id
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(s, d)
    n = duckdb.sql(
        f"SELECT source, COUNT(*) FROM read_parquet("
        f"'{dst}/documents.parquet') GROUP BY 1 ORDER BY 2 DESC LIMIT 3"
    ).fetchall()
    print(f"skew corpus at {dst}; top sources: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
