"""Scale-curve summary: pair-count and wall-clock slopes across SFs.

Reads the per-query sections of two or more BENCH detail files (each
produced by bench.py at a different scale factor) and reports, per
spec, the log-log slope of output rows and of warm/cold wall-clock
against the scale factor. For the candidate-generation family
(dedup_*, similarity_*, multimodal_phash) the ROWS slope is the
superlinearity audit VERDICT r5 item 2 asks for: a near-dup operator
whose candidate-pair output grows ~linearly with corpus size (slope
≈ 1) has a bounded candidate stage; slope → 2 means all-pairs growth
leaked in. Writes SCALE_CURVE.json at the repo root.

Run: python tools/scale_slopes.py BENCH_detail.json:0.1 \
         BENCH_sf1_detail.json:1 BENCH_sf10_detail.json:10
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.normpath(os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    # Each arg is <file>:<sf>.  A bench detail file contributes rows +
    # timings; a CORRECTNESS_*.json file (recognized by its "specs"
    # key) contributes rows only — that lets a spec too expensive to
    # multi-pass bench at a large SF (e.g. multimodal_phash_near_dup
    # at sf10) still get its output-growth slope from the single-shot
    # correctness run.  Files at the same sf merge into one point.
    by_sf: dict[float, dict] = {}
    for arg in sys.argv[1:]:
        path, _, sf = arg.partition(":")
        with open(os.path.join(REPO, path)) as f:
            data = json.load(f)
        if "per_query" in data:
            pq = data["per_query"]
        else:
            pq = {
                n: {"rows": v.get("spark_rows")}
                for n, v in data["specs"].items()
            }
        merged = by_sf.setdefault(float(sf), {})
        for n, v in pq.items():
            tgt = merged.setdefault(n, {})
            for k, val in v.items():
                if val is not None:
                    tgt.setdefault(k, val)
    points = sorted(by_sf.items())
    if len(points) < 2:
        print("need >= 2 detail files", file=sys.stderr)
        return 1

    specs = set.intersection(*(set(pq) for _, pq in points))
    out = {}
    for name in sorted(specs):
        series = []
        for sf, pq in points:
            v = pq[name]
            series.append(
                {
                    "sf": sf,
                    "rows": v.get("rows"),
                    "spark_s": v.get("spark_s"),
                    "spark_cold_s": v.get("spark_cold_s"),
                    "duckdb_s": v.get("duckdb_s"),
                }
            )

        def slope(key: str) -> float | None:
            # log-log slope between the FIRST and LAST scale point
            a, b = series[0], series[-1]
            try:
                if not a[key] or not b[key]:
                    return None
                return round(
                    math.log(b[key] / a[key])
                    / math.log(b["sf"] / a["sf"]),
                    3,
                )
            except (TypeError, ZeroDivisionError, ValueError):
                return None

        out[name] = {
            "points": series,
            "rows_slope": slope("rows"),
            "warm_slope": slope("spark_s"),
            "cold_slope": slope("spark_cold_s"),
            "duckdb_slope": slope("duckdb_s"),
        }

    fam = {
        n: v
        for n, v in out.items()
        if n.startswith(("dedup_", "similarity_", "pack_", "multimodal_phash"))
    }
    summary = {
        "sfs": [sf for sf, _ in points],
        "note": "rows_slope ~1 = linear candidate growth (bounded "
        "candidate stage); ~2 = all-pairs growth. Slopes are log-log "
        "between the outermost scale points.",
        "candidate_family_rows_slopes": {
            n: v["rows_slope"] for n, v in sorted(fam.items())
        },
        "per_spec": out,
    }
    path = os.path.join(
        REPO, os.environ.get("SCALE_CURVE_OUT", "SCALE_CURVE.json")
    )
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    for n, v in sorted(fam.items()):
        print(
            f"{n:32s} rows_slope={v['rows_slope']} "
            f"warm_slope={v['warm_slope']} cold_slope={v['cold_slope']}"
        )
    print(f"-> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
