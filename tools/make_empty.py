"""Build the ZERO-ROW corpus (adversarial wave 7).

Every table keeps its exact schema but carries no rows — the shape a
real lake shows on a fresh partition, a filtered-to-nothing branch, or
a just-created table. On clean data the engine's aggregates, windows,
k-means fits, banding matmuls and div-by-zero guards always see rows;
this corpus drives every one of the 156 specs through the empty path,
where the classic failures live (reduce on empty input, seeds taken
from an empty top-k, percentile of nothing, 0/0 shares).

The DuckDB oracle reads the same empty parquet, so any spec that
crashes or hash-mismatches here is a genuine degenerate-input defect;
both engines returning the same (usually empty, sometimes single
NULL-aggregate-row) result is the pass.

Run:  python tools/make_empty.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".artifacts", "sf0.01_empty")
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        s, d = os.path.join(src, f), os.path.join(dst, f)
        # LIMIT 0 preserves the full parquet schema (incl. nested
        # list/timestamp types) with zero row groups
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{s}') LIMIT 0) "
            f"TO '{d}' (FORMAT PARQUET)"
        )
        print(f"{f}: schema-only")
    print(f"-> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
