"""Measured recall@10 per ANN variant per scale factor (VERDICT r7
item 8): the committed evidence behind the regression tripwires in
tests/test_similarity_oracle.py.

Ground truth is the exact brute-force spec (similarity_topk_cosine);
recall@10 = |ANN top-10 ∩ exact top-10| / |exact top-10| over all
query points. Writes ANN_RECALL.json at the repo root.

Run:  python tools/ann_recall.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = (
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_ivf_kmeans",
    "similarity_pq_adc",
)


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".artifacts", "sf1"),
    ]
    from gcp_dbt_data_engineering_spark import get_spark
    from gcp_dbt_data_engineering_spark.operators.similarity import SPECS

    spark = get_spark(app_name="ann_recall")
    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir} (absent)")
            continue
        bf = {}
        for r in SPECS["similarity_topk_cosine"].spark(spark, sf_dir).collect():
            bf.setdefault(r.query_id, set()).add(r.neighbor_id)
        n_pairs = sum(len(v) for v in bf.values())
        row: dict[str, float] = {
            "n_queries": len(bf), "n_exact_pairs": n_pairs,
        }
        for name in VARIANTS:
            hits = 0
            for r in SPECS[name].spark(spark, sf_dir).collect():
                if r.neighbor_id in bf.get(r.query_id, ()):
                    hits += 1
            row[name] = round(hits / n_pairs, 4)
        out[os.path.basename(sf_dir.rstrip("/"))] = row
        print(sf_dir, row)
    path = os.path.join(REPO, "ANN_RECALL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
