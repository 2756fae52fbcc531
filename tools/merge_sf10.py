"""Merge the full-sweep and recheck artifacts into CORRECTNESS_sf10.json.

Inputs:
- CORRECTNESS_sf10_main.json — tools/correctness_full.py over ALL specs
  at sf10 with ORACLE_SKIP for the intractable-oracle specs (those
  appear as rows-only);
- CORRECTNESS_sf10_recheck.json — tools/sf10_recheck.py sliced/staged
  EXACT verdicts for exactly those six.

The merged record keeps the recheck's hash verdict and its `method`
string, so the artifact states per spec HOW exactness was established.
Summary counters: n_pass counts hash_match is True (full or
sliced/staged exact); n_rows_only counts remaining weak records.

Run:  python tools/merge_sf10.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "CORRECTNESS_sf10_main.json")) as f:
        main_d = json.load(f)
    with open(os.path.join(REPO, "CORRECTNESS_sf10_recheck.json")) as f:
        re_d = json.load(f)
    specs = dict(main_d["specs"])
    for name, rec in re_d["specs"].items():
        base = specs.get(name, {})
        merged = dict(rec)
        # keep the full-output Spark row count from the main sweep
        # (the recheck's spark_rows is the SLICE size for sliced specs)
        if base.get("spark_rows") is not None:
            merged["full_spark_rows"] = base["spark_rows"]
        specs[name] = merged
    n_pass = sum(1 for r in specs.values() if r.get("hash_match") is True)
    n_weak = sum(
        1 for r in specs.values() if isinstance(r.get("hash_match"), str)
    )
    n_fail = len(specs) - n_pass - n_weak
    out = {
        "sf_dir": main_d["sf_dir"],
        "n_specs": len(specs),
        "n_pass": n_pass,
        "n_rows_only": n_weak,
        "n_fail": n_fail,
        "note": (
            "full-oracle sweep (tools/correctness_full.py) merged with "
            "sliced/staged exact rechecks (tools/sf10_recheck.py) for "
            "the eleven specs whose naive DuckDB oracles (or, for phash, the full Spark run) are intractable "
            "at sf10; per-spec 'method' states how exactness was "
            "established"
        ),
        "specs": specs,
    }
    path = os.path.join(REPO, "CORRECTNESS_sf10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"merged: {len(specs)} specs — {n_pass} exact, "
        f"{n_weak} rows-only, {n_fail} fail -> {path}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
