"""Build the adversarial-content corpus for the robustness sweep.

Copies an sf dir and injects the pathological rows a real 100 TB
crawl/training corpus always contains, into `documents` and
`embeddings` (every other table is byte-identical):

documents (appended, doc_id ≥ 900000):
  empty string, whitespace-only (including a non-breaking space —
  the only multi-byte UTF-8 char in an otherwise-ASCII doc, which is
  exactly what exposed the byte-vs-codepoint oracle divergence in
  multimodal_byte_features), single char, punctuation-only, a
  50k-char single-repeated-char doc, an exact duplicate of doc 0's
  text under a new id, a one-char-edit near-duplicate of doc 0,
  unicode stress (ZWJ emoji, astral-plane letters, combining marks,
  RTL Hebrew/Arabic, CJK, ligatures), quote/backslash/control
  whitespace soup, and a NULL-text/NULL-lang row. `n_chars` is
  recomputed as code-point length for injected rows.

embeddings (appended, vec_id ≥ 900000):
  the all-zero vector (cosine denominators!), an exact duplicate of
  vec 0, a ±1e30 huge-magnitude vector, a 1e-30 denormal-scale
  vector, and a NULL-embedding row.

The oracles stay exact by construction — DuckDB reads the same
injected parquet. Anything that crashes or hash-mismatches on this
corpus is a genuine content-robustness defect (division by zero on
empty docs, unicode length disagreements, NaN ordering, null
propagation), the class of failure small-SF clean data never shows.

Run:  python tools/make_nasty.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

UNICODE_STRESS = (
    "\U0001f469‍\U0001f469‍\U0001f467‍\U0001f466 "
    "café vs café, בְּרֵא"
    "שִׁית برنام"
    "ج 你好世界 \U0001d518\U0001d52b\U0001d526"
    "\U0001d520\U0001d52c\U0001d521\U0001d522 ﬁne"
)
QUOTE_SOUP = (
    "it's a \"test\" with \\backslashes\\ and\tmixed\r\n'quotes' "
    "-- ; DROP TABLE documents; %s {fmt} $dollar `tick`"
)


def doc_rows() -> list[tuple]:
    """(doc_id, text, lang) — source fixed below, n_chars computed."""
    return [
        (900000, "", "en"),
        (900001, "   \n\t  \xa0 ", "en"),
        (900002, "a", "en"),
        (900003, "!!! ??? ... ,,, ;;;", "en"),
        (900004, "x" * 50000, "en"),
        (900007, UNICODE_STRESS, "zz"),
        (900008, QUOTE_SOUP, "en"),
        (900009, None, None),
        # media-type-aligned stress (media_type = doc_id % 3:
        # 0=image, 1=audio, 2=video). The first batch's unicode doc
        # happened to land on audio; these pin every decoder path
        # against multi-byte payloads (phash samples single BYTES out
        # of payloads — mid-codepoint slices must not corrupt) and
        # zero-length bodies.
        (900010, "", "en"),               # audio, empty body
        (900011, UNICODE_STRESS, "zz"),   # video, multi-byte payload
        (900012, UNICODE_STRESS, "zz"),   # image, multi-byte payload
        (900014, "", "en"),               # video, empty body
    ]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".artifacts", "sf0.01_nasty")
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
                "text VARCHAR, lang VARCHAR)"
            )
            con.executemany(
                "INSERT INTO inj VALUES (?, ?, ?)", doc_rows()
            )
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  -- exact duplicate + one-char-edit near-duplicate of
                  -- doc 0 under fresh ids (cross-id dedup bait)
                  SELECT 900005, text, lang, 'src_nasty', n_chars
                  FROM read_parquet('{s}') WHERE doc_id = 0
                  UNION ALL
                  SELECT 900006, 'Z' || substr(text, 2), lang,
                         'src_nasty', length('Z' || substr(text, 2))
                  FROM read_parquet('{s}') WHERE doc_id = 0
                  UNION ALL
                  SELECT doc_id, text, lang, 'src_nasty', length(text)
                  FROM inj
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
                  SELECT 900000,
                         list_transform(range(64), i -> CAST(0.0 AS FLOAT)),
                         0
                  UNION ALL
                  SELECT 900001, embedding, label
                  FROM read_parquet('{s}') WHERE vec_id = 0
                  UNION ALL
                  SELECT 900002,
                         list_transform(range(64), i ->
                           CAST(CASE WHEN i % 2 = 0 THEN 1e30
                                     ELSE -1e30 END AS FLOAT)),
                         1
                  UNION ALL
                  SELECT 900003,
                         list_transform(range(64), i ->
                           CAST(1e-30 AS FLOAT)),
                         2
                  UNION ALL
                  SELECT 900004, NULL, 3
                  ORDER BY 1
                ) TO '{d}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(s, d)
    chk = con.execute(
        f"SELECT COUNT(*), COUNT(text), MAX(n_chars) FROM "
        f"read_parquet('{dst}/documents.parquet')"
    ).fetchall()
    chk2 = con.execute(
        f"SELECT COUNT(*), COUNT(embedding) FROM "
        f"read_parquet('{dst}/embeddings.parquet')"
    ).fetchall()
    print(f"nasty corpus at {dst}; documents {chk}, embeddings {chk2}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
