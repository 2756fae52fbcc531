"""Chunked sf10 full-coverage sweep.

The single-process 155-spec run at sf10 takes hours, and
tools/correctness_full.py writes its artifact only at END of run —
a crash loses everything (verify-skill gotcha).  This wrapper splits
the spec list into fixed-size chunks, runs each as a subprocess with
``SPECS_ONLY='^(a|b|...)$'`` and ``CORRECTNESS_OUT=
CORRECTNESS_sf10_part{i}.json``, skipping chunks whose part file
already exists (resume after kill), then merges the parts into
``CORRECTNESS_sf10_main.json`` (same shape the full gate writes).

The ten quadratic-oracle specs run with ORACLE_SKIP (rows-only in the
main artifact); tools/sf10_recheck.py supplies their exact verdicts and
tools/merge_sf10.py folds both into CORRECTNESS_sf10.json.

Run:  python tools/sf10_chunked.py [sf_dir] [chunk_size]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "correctness_full.py")

#: oracles intractable in DuckDB at sf10 (hot-shingle self-joins /
#: brute-force cosine grids) — exactness comes from tools/sf10_recheck.py
ORACLE_SKIP = (
    "^(dedup_ngram_jaccard|dedup_containment|dedup_cluster_components"
    "|dedup_keep_best|dedup_embedding_cosine|dedup_semantic"
    "|dedup_graph_pagerank"
    "|similarity_topk_cosine|similarity_ann_lsh|similarity_pq_adc"
    "|multimodal_phash_near_dup)$"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".artifacts", "sf10"
    )
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = sorted(entry.queries().keys())
    chunks = [names[i : i + chunk] for i in range(0, len(names), chunk)]
    parts = []
    for i, group in enumerate(chunks):
        part = f"CORRECTNESS_sf10_part{i:02d}.json"
        parts.append(part)
        path = os.path.join(REPO, part)
        if os.path.exists(path):
            print(f"== chunk {i}: {part} exists, skipping ==", flush=True)
            continue
        rx = "^(" + "|".join(re.escape(n) for n in group) + ")$"
        print(f"== chunk {i}: {len(group)} specs ==", flush=True)
        # NOT check=True: the gate exits nonzero when any spec records
        # an error, but the part file is still complete and valid (the
        # error is data — patch-rerun those specs afterwards). Only a
        # missing part file (gate crashed before writing) is fatal.
        subprocess.run(
            [sys.executable, GATE, sf_dir],
            env={
                **os.environ,
                "SPECS_ONLY": rx,
                "ORACLE_SKIP": ORACLE_SKIP,
                "CORRECTNESS_OUT": part + ".tmp",
            },
            check=False,
            cwd=REPO,
        )
        if not os.path.exists(path + ".tmp"):
            raise RuntimeError(f"chunk {i}: gate died before writing")
        os.replace(path + ".tmp", path)
    specs: dict[str, dict] = {}
    for part in parts:
        with open(os.path.join(REPO, part)) as f:
            specs.update(json.load(f)["specs"])
    n_pass = sum(1 for r in specs.values() if r["hash_match"] is True)
    n_weak = sum(1 for r in specs.values() if isinstance(r["hash_match"], str))
    merged = {
        "sf_dir": sf_dir,
        "n_specs": len(specs),
        "n_pass": n_pass,
        "n_rows_only": n_weak,
        "n_fail": len(specs) - n_pass - n_weak,
        "specs": specs,
    }
    with open(os.path.join(REPO, "CORRECTNESS_sf10_main.json"), "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: v for k, v in merged.items() if k != "specs"}))
    return 0 if merged["n_fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
