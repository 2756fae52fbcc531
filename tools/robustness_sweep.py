"""Cross-engine robustness sweep: the full correctness gate under
perturbed execution configs.

The driver gate runs at one scale factor on one comfortable local
config; real divergences hide in the corners. This sweep re-runs
``tools/correctness_full.py`` across:

- scale factors sf0.001 / sf0.01 / sf0.1 (found two real 1-ulp
  decimal->double divergences in round 4: profiler stddev at sf0.1,
  moments correlation at sf0.001);
- degenerate parallelism (local[3], 3 shuffle partitions) — catches
  any result that depends on partition count or merge order, i.e.
  violations of the exact-decimal aggregation contract;
- AQE disabled — catches results that depend on adaptive re-planning;
- (r8) local-cluster[2,2,4096] — 2 SEPARATE executor JVMs + python
  workers: crosses a real process boundary, flushing single-JVM
  assumptions (closure serialization, env propagation, session-memo
  handles living driver-side only);
- (r8) lowmem 4g driver at sf0.1 — memory pressure on the persisted
  shingle/pair relations and tiled pair kernels;
- (r8) skewed_hot_domain — a rewritten sf0.01 corpus where ONE source
  domain holds 50% of documents (built by tools/make_skew.py): hot-key
  stress on the dedup/curation group-bys and pair joins, still
  exact-oracle-checked because DuckDB reads the same skewed parquet.

Writes ROBUSTNESS.json at the repo root: one row per (config) with
pass/fail counts. Run:  python tools/robustness_sweep.py
CONFIGS='regex' narrows to matching config names and MERGES into the
existing ROBUSTNESS.json instead of replacing it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "tools", "correctness_full.py")

NO_AQE_STUB = """
import sys
sys.path.insert(0, {repo!r})
import gcp_dbt_data_engineering_spark.session as sess
sess.RUNTIME_CONF["spark.sql.adaptive.enabled"] = "false"
sys.argv = ["correctness_full.py", {sf!r}]
import runpy
runpy.run_path({gate!r}, run_name="__main__")
"""


def _summary() -> dict:
    with open(os.path.join(REPO, "CORRECTNESS_full.json")) as f:
        d = json.load(f)
    return {
        "n_specs": d.get("n_specs"),
        "n_pass": d.get("n_pass"),
        "n_rows_only": d.get("n_rows_only"),
        "n_fail": d.get("n_fail"),
    }




def _run_stamp() -> dict:
    """Commit + wall-clock stamp embedded in the artifact (VERDICT r10
    item 8): identical-content re-runs are otherwise invisible in git,
    making 'did the sweep actually re-run?' unverifiable."""
    import subprocess, time
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO,
        ).stdout.strip()
    except OSError:
        commit = "unknown"
    return {"commit": commit,
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}


def main() -> int:
    keep = os.path.join(REPO, "CORRECTNESS_full.json")
    with open(keep) as f:
        original = f.read()
    results: dict[str, dict] = {}
    configs = [
        ("sf0.001", {}, ["/root/testdata/sf0.001"]),
        ("sf0.01", {}, []),
        ("sf0.1", {}, ["/root/testdata/sf0.1"]),
        (
            "sf0.01_local3_shuffle3",
            {"SPARK_GRAFT_CPUS": "3", "SPARK_GRAFT_SHUFFLE": "3"},
            [],
        ),
        (
            "sf0.01_local_cluster_2x2",
            {
                "SPARK_GRAFT_MASTER": "local-cluster[2,2,4096]",
                "PYTHONPATH": REPO,
                "SPARK_GRAFT_SHUFFLE": "8",
            },
            [],
        ),
        (
            "sf0.1_lowmem_4g",
            {"SPARK_DRIVER_MEMORY": "4g"},
            ["/root/testdata/sf0.1"],
        ),
        (
            "sf0.01_skewed_hot_domain",
            {},
            [os.path.join(REPO, ".artifacts", "sf0.01_skew")],
        ),
        # adversarial content (tools/make_nasty.py): empty/unicode/
        # 50k-char docs, NULL text/lang, zero/huge/denormal/NULL
        # embeddings — the r8 sweep that surfaced 18 content-
        # robustness defects (overflowing int64 norm folds, NULL-key
        # joins dropping rows, byte-vs-codepoint oracle divergence)
        (
            "sf0.01_nasty_content",
            {},
            [os.path.join(REPO, ".artifacts", "sf0.01_nasty")],
        ),
        # duplicate storm (tools/make_dupstorm.py, wave 8): 300
        # verbatim boilerplate copies + 100 one-token edits (one LSH
        # bucket holds ~37% of documents; 301-clique near-dup graph),
        # 300 identical + 100 near-identical embeddings (k-means point
        # mass, cosine-1.0 tie storms), a hot customer with 17% of
        # orders — the boilerplate-heavy crawl reality that turns
        # bucketed algorithms quadratic and ties nondeterministic
        (
            "sf0.01_dup_storm",
            {},
            [os.path.join(REPO, ".artifacts", "sf0.01_dupstorm")],
        ),
    ]
    only = os.environ.get("CONFIGS")
    if only:
        import re

        rx = re.compile(only)
        configs = [c for c in configs if rx.search(c[0])]
    # ALWAYS merge into the existing artifact: entries written by OTHER
    # tools (sf0.001_speculation_stragglers, from speculation_gate.py)
    # must survive a full sweep — a replace-write silently dropped that
    # row in r10 (the same overwrite class as the r9 ANN_CANDIDATES
    # loss; this run's configs overwrite only their own keys).
    out_path = os.path.join(REPO, "ROBUSTNESS.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f))
    builders = {
        os.path.join(REPO, ".artifacts", "sf0.01_skew"): "make_skew.py",
        os.path.join(REPO, ".artifacts", "sf0.01_nasty"): "make_nasty.py",
        os.path.join(REPO, ".artifacts", "sf0.01_dupstorm"):
            "make_dupstorm.py",
    }
    try:
        for name, env, args in configs:
            for arg in args:  # derived corpora rebuild on demand
                tool = builders.get(arg)
                if tool and not os.path.exists(arg):
                    print(f"== building {arg} ==", flush=True)
                    subprocess.run(
                        [
                            sys.executable,
                            os.path.join(REPO, "tools", tool),
                        ],
                        check=True,
                        cwd=REPO,
                    )
            print(f"== {name} ==", flush=True)
            subprocess.run(
                [sys.executable, GATE, *args],
                env={**os.environ, **env},
                check=True,
                cwd=REPO,
            )
            results[name] = _summary()
        if not only or __import__("re").search(only, "sf0.01_no_aqe"):
            print("== sf0.01_no_aqe ==", flush=True)
            stub = NO_AQE_STUB.format(repo=REPO, sf="/root/testdata/sf0.01",
                                      gate=GATE)
            subprocess.run(
                [sys.executable, "-c", stub], check=True, cwd=REPO
            )
            results["sf0.01_no_aqe"] = _summary()
    finally:
        with open(keep, "w") as f:
            f.write(original)  # the committed artifact stays the sf0.01 gate
    results["run_stamp"] = _run_stamp()
    out = os.path.join(REPO, "ROBUSTNESS.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    bad = [n for n, r in results.items()
           if n != "run_stamp" and r["n_fail"]]
    print("SWEEP", "FAIL: " + ", ".join(bad) if bad else "ALL GREEN")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
