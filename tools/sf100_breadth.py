"""sf100 exact evidence for the 10 remaining rows-only specs
(VERDICT r8 item 3) — extending the sliced/staged method that closed
sf10 (tools/sf10_recheck.py) and the 2-spec sf100 recheck
(tools/sf100_recheck.py) to the whole candidate family.

Methods per spec (same honesty rules as sf10):

- **full-oracle** (linear oracles DuckDB can actually run at sf100):
  ``dedup_exact``, ``dedup_repeated_spans``, ``pack_sequences_chunked``,
  ``pack_sequences_greedy``. Full Spark output vs full oracle, exact
  hash.
- **sliced-exact** (pair joins whose unrestricted candidate stream is
  quadratic): ``dedup_ngram_jaccard``, ``dedup_containment``,
  ``dedup_minhash_lsh``, ``dedup_simhash``. The Spark spec runs IN
  FULL; its output is filtered to pairs touching a deterministic
  1/SLICE_MOD doc slice, and a restricted oracle (two one-side-sliced
  join branches) computes exactly those pairs.
- **staged-exact** (deterministic closures of the edge relation):
  ``dedup_cluster_components``, ``dedup_keep_best``. FULL Spark output
  vs a pure-Python union-find over the Spark edge list (edge logic
  slice-verified here and fully hash-verified at sf <= 1) plus linear
  DuckDB shingle counts.

Cost control: the shingle relation (5e8 rows at sf100) is shingled
ONCE into a file-backed DuckDB table and every sliced oracle reads it
as a view — re-deriving it per oracle was the sf100 wall-clock killer.

Self-test: ``python tools/sf100_breadth.py /root/testdata/sf0.01
--selftest`` additionally verifies, per sliced spec, that the sliced
oracle's rows equal the FULL committed oracle's rows filtered to the
slice (the full oracle is tractable at selftest scale).

Writes/merges into CORRECTNESS_sf100_recheck.json ($RECHECK_OUT to
override; RECHECK_ONLY='regex' limits specs and merges).

Run:  python tools/sf100_breadth.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback
from typing import Any

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from correctness_full import _canon, _sha  # noqa: E402
from sf10_recheck import _cmp, _python_closure  # noqa: E402

SLICE_MOD = int(os.environ.get("SLICE_MOD", "1000"))


def _shingle_views(con) -> str:
    """Materialize sh/sz ONCE into the file-backed db; return the WITH
    prefix that makes every oracle read them as plain views."""
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        _sql_shingle_cte,
    )

    have = {
        r[0]
        for r in con.execute(
            "SELECT table_name FROM information_schema.tables"
        ).fetchall()
    }
    if "sh_t" not in have:
        print("materializing sh_t/sz_t (one-time shingle pass)...",
              flush=True)
        con.execute(
            f"CREATE TABLE sh_t AS WITH {_sql_shingle_cte()}"
            " SELECT * FROM sh"
        )
        con.execute(
            "CREATE TABLE sz_t AS SELECT doc_id, COUNT(*) AS n"
            " FROM sh_t GROUP BY doc_id"
        )
    return (
        "sh AS (SELECT * FROM sh_t),\n"
        "sz AS (SELECT * FROM sz_t)"
    )


def _retarget(oracle: str) -> str:
    """Point an oracle's shingle CTEs at the materialized tables."""
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        _sql_shingle_cte,
    )

    cte = _sql_shingle_cte()
    assert cte in oracle
    return oracle.replace(
        cte,
        "\nsh AS (SELECT * FROM sh_t),\nsz AS (SELECT * FROM sz_t)",
    )


# ---------------------------------------------------------------------------
# sliced oracles (pair joins)
# ---------------------------------------------------------------------------

def _sliced_pair_oracles() -> dict[str, str]:
    """jaccard + containment — the sf10 builders, at SLICE_MOD, against
    the materialized shingle tables."""
    import sf10_recheck as R

    R.PAIR_MOD = SLICE_MOD
    return {k: _retarget(v) for k, v in R._sliced_pair_oracles().items()}


def _sliced_minhash() -> str:
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        ORACLE_MINHASH_LSH,
    )

    on = "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"
    old = f"""cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    {on})"""
    new = f"""sbands AS MATERIALIZED (
  SELECT * FROM bands WHERE doc_id % {SLICE_MOD} = 0),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sbands a JOIN bands b {on}
    UNION ALL
    SELECT a.doc_id, b.doc_id
    FROM bands a JOIN sbands b {on}
    WHERE a.doc_id % {SLICE_MOD} <> 0))"""
    assert old in ORACLE_MINHASH_LSH
    sliced = ORACLE_MINHASH_LSH.replace(old, new)
    # DuckDB re-evaluates a CTE per reference: the two union branches
    # each rebuild bands -> mins -> a 16-min-agg group-by over the
    # 5e8-row shingle table — at sf100 that spilled past a 50 GB temp
    # budget and ENOSPC'd. MATERIALIZE the per-doc stages once.
    for cte in ("mins AS (", "bands AS ("):
        assert cte in sliced, cte
        sliced = sliced.replace(
            cte, cte.replace("AS (", "AS MATERIALIZED (")
        )
    return _retarget(sliced)


def _simhash_table(con) -> None:
    """Materialize sim_t(doc_id, simhash) into the breadth db.

    The signs stage — one GROUP BY doc_id with 60 SUM(CASE bit) aggs
    over the 3.5e8-row shingle table — spilled past the sf100 disk
    budget even MATERIALIZED (observed: >40 GB temp, ENOSPC). Per-doc
    groups are disjoint under a modular doc_id split, so four passes
    of a quarter of the input each are exactly equivalent and bound
    the spill. The generators mirror dedup._sql_simhash verbatim
    (same _sim_bit / shiftleft / fp fold); the selftest pins equality
    against the committed full oracle.
    """
    from gcp_dbt_data_engineering_spark.operators import texthash as th
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        _SIM_A2,
        _SIM_B2,
        SIMHASH_BITS,
        _sim_bit,
    )

    have = {
        r[0]
        for r in con.execute(
            "SELECT table_name FROM information_schema.tables"
        ).fetchall()
    }
    if "sim_t" in have:
        return
    sign_cols = ",\n       ".join(
        f"SUM(CASE WHEN {_sim_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END)"
        f" AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {th.shiftleft_one(str(j), 'duck')}"
        " ELSE CAST(0 AS BIGINT) END"
        for j in range(SIMHASH_BITS)
    )
    con.execute("CREATE TABLE sim_t (doc_id BIGINT, simhash BIGINT)")
    for r in range(4):
        print(f"  sim_t pass {r + 1}/4...", flush=True)
        con.execute(f"""INSERT INTO sim_t
WITH shx AS (SELECT doc_id, h,
               (({_SIM_A2} * h + {_SIM_B2}) % {th.P}) AS h2
             FROM sh_t WHERE doc_id % 4 = {r}),
signs AS (SELECT doc_id,
       {sign_cols}
       FROM shx GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM signs""")


def _sliced_simhash() -> str:
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        HAMMING_T,
        _sql_chunk_values,
    )

    pair = ("SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            " CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)"
            " AS hamming")
    on = "ON a.k = b.k AND a.ck = b.ck AND a.doc_id < b.doc_id"
    return f"""
WITH chunks AS MATERIALIZED (
  SELECT doc_id, simhash, k, (simhash >> off) & mask AS ck
  FROM sim_t, (VALUES {_sql_chunk_values()}) AS c(k, off, mask)),
schunks AS MATERIALIZED (
  SELECT * FROM chunks WHERE doc_id % {SLICE_MOD} = 0)
SELECT DISTINCT doc_a, doc_b, hamming
FROM (
  {pair} FROM schunks a JOIN chunks b {on}
  UNION ALL
  {pair} FROM chunks a JOIN schunks b {on}
  WHERE a.doc_id % {SLICE_MOD} <> 0)
WHERE hamming <= {HAMMING_T}
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".artifacts", "sf100"
    )
    selftest = "--selftest" in sys.argv

    from gcp_dbt_data_engineering_spark import get_spark
    from gcp_dbt_data_engineering_spark.operators.dedup import (
        SPECS as DSPECS,
        _jaccard_pair_list,
    )
    from gcp_dbt_data_engineering_spark.operators.pipeline import (
        SPECS as PSPECS,
    )
    from gcp_dbt_data_engineering_spark.sources import TABLES, table_path

    spark = get_spark(app_name="sf100_breadth")
    # file-backed db keyed by the corpus dir name: the one-time
    # shingle materialization survives re-runs, and a different corpus
    # can never read another corpus's sh_t
    db_path = os.environ.get(
        "BREADTH_DB",
        os.path.join(
            REPO, ".artifacts",
            f"breadth_{os.path.basename(sf_dir.rstrip(os.sep))}.duckdb",
        ),
    )
    if not selftest:
        os.makedirs(os.path.dirname(db_path), exist_ok=True)
    con = duckdb.connect(db_path if not selftest else ":memory:")
    con.execute(
        "SET memory_limit = "
        f"'{os.environ.get('DUCKDB_MEMORY_LIMIT', '48GB')}'"
    )
    con.execute("SET temp_directory = '/tmp/duckdb_spill_breadth'")
    con.execute("SET max_temp_directory_size = '50GB'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    _shingle_views(con)
    _simhash_table(con)

    out: dict[str, dict] = {}
    only = os.environ.get("RECHECK_ONLY")
    only_rx = re.compile(only) if only else None

    def run(name, method, spark_df, oracle_sql=None, oracle_rows=None,
            oracle_cols=None):
        if only_rx is not None and not only_rx.search(name):
            print(f"SKIP  {name} (RECHECK_ONLY)")
            return
        rec: dict[str, Any] = {"method": method, "err": None}
        try:
            s_cols = spark_df.columns
            s_rows = [tuple(r) for r in spark_df.collect()]
            if oracle_sql is not None:
                cur = con.execute(oracle_sql)
                d_cols = [d[0] for d in cur.description]
                d_rows = cur.fetchall()
            else:
                d_cols, d_rows = oracle_cols, oracle_rows
            _cmp(rec, s_cols, s_rows, d_cols, d_rows)
            ok = (rec["rows_match"] and rec["schema_match"]
                  and rec["hash_match"])
            print(f"{'PASS ' if ok else 'FAIL*'} {name} [{method[:40]}]: "
                  f"spark={rec['spark_rows']} oracle={rec['oracle_rows']}",
                  flush=True)
            if not ok and rec.get("first_diff"):
                print(f"      first_diff: {rec['first_diff']}")
        except Exception:  # noqa: BLE001
            rec["err"] = traceback.format_exc(limit=3)
            print(f"ERROR {name}:\n{rec['err']}", flush=True)
        out[name] = rec

    # --- full-oracle linear specs -----------------------------------------
    for name, specs in (
        ("dedup_exact", DSPECS),
        ("dedup_repeated_spans", DSPECS),
        ("pack_sequences_chunked", PSPECS),
        ("pack_sequences_greedy", PSPECS),
    ):
        spec = specs[name]
        run(
            name,
            "full-exact: the oracle is linear (no pair join) and "
            "DuckDB runs it whole at this sf",
            spec.spark(spark, sf_dir),
            oracle_sql=spec.oracle,
        )

    # --- sliced pair specs --------------------------------------------------
    po = _sliced_pair_oracles()
    sliced_specs = {
        "dedup_ngram_jaccard": (
            po["dedup_ngram_jaccard"],
            f"doc_a % {SLICE_MOD} = 0 OR doc_b % {SLICE_MOD} = 0",
        ),
        "dedup_containment": (
            po["dedup_containment"],
            f"contained_doc % {SLICE_MOD} = 0"
            f" OR container_doc % {SLICE_MOD} = 0",
        ),
        "dedup_minhash_lsh": (
            _sliced_minhash(),
            f"doc_a % {SLICE_MOD} = 0 OR doc_b % {SLICE_MOD} = 0",
        ),
        "dedup_simhash": (
            _sliced_simhash(),
            f"doc_a % {SLICE_MOD} = 0 OR doc_b % {SLICE_MOD} = 0",
        ),
    }
    for name, (osql, flt) in sliced_specs.items():
        run(
            name,
            f"sliced-exact: full Spark output filtered to pairs "
            f"touching doc_id % {SLICE_MOD} == 0; one-side-sliced "
            f"oracle branches compute exactly those pairs",
            DSPECS[name].spark(spark, sf_dir).filter(flt),
            oracle_sql=osql,
        )
        if selftest and (only_rx is None or only_rx.search(name)):
            # sliced oracle == full committed oracle filtered to slice
            full = con.execute(DSPECS[name].oracle).fetchall()
            cols = [
                d[0]
                for d in con.execute(
                    DSPECS[name].oracle + " LIMIT 0"
                ).description
            ]
            ia, ib = 0, 1  # pair id columns lead in every pair spec
            full_sliced = [
                r for r in full
                if r[ia] % SLICE_MOD == 0 or r[ib] % SLICE_MOD == 0
            ]
            got = con.execute(osql).fetchall()
            ok = _sha(_canon(cols, full_sliced)) == _sha(_canon(cols, got))
            print(f"  selftest {name}: sliced-oracle == full-oracle"
                  f"-filtered: {ok}")
            out[name]["selftest_vs_full_oracle"] = ok

    # --- staged closure specs -----------------------------------------------
    if only_rx is None or only_rx.search("dedup_cluster_components") \
            or only_rx.search("dedup_keep_best"):
        edges = [
            (r.doc_a, r.doc_b)
            for r in _jaccard_pair_list(spark, sf_dir).collect()
        ]
        doc_ids = [
            r[0]
            for r in con.execute("SELECT doc_id FROM documents").fetchall()
        ]
        labels = _python_closure(edges, doc_ids)
        staged_note = (
            "staged-exact: FULL output vs python union-find over the "
            "Spark edge relation (edge logic slice-verified above at "
            "this sf and fully hash-verified at sf<=1) "
        )
        comp: dict[int, dict] = {}
        for d, lab in labels.items():
            c = comp.setdefault(lab, {"n": 0, "mx": d})
            c["n"] += 1
            c["mx"] = max(c["mx"], d)
        run(
            "dedup_cluster_components",
            staged_note + "+ per-component count/max fold",
            DSPECS["dedup_cluster_components"].spark(spark, sf_dir),
            oracle_rows=[(k, v["n"], v["mx"]) for k, v in comp.items()],
            oracle_cols=["component_id", "n_docs", "max_doc"],
        )
        sz = dict(con.execute("SELECT doc_id, n FROM sz_t").fetchall())
        best: dict[int, dict] = {}
        for d, lab in labels.items():
            n = sz.get(d, 0)
            c = best.setdefault(lab, {"n_docs": 0, "key": None})
            c["n_docs"] += 1
            k = (n, -d)
            if c["key"] is None or k > c["key"]:
                c["key"] = k
        run(
            "dedup_keep_best",
            staged_note + "+ linear DuckDB shingle counts + python "
            "argmax",
            DSPECS["dedup_keep_best"].spark(spark, sf_dir),
            oracle_rows=[
                (lab, c["n_docs"], -c["key"][1], c["key"][0],
                 c["n_docs"] - 1)
                for lab, c in best.items()
            ],
            oracle_cols=[
                "component_id", "n_docs", "keep_doc", "keep_n_shingles",
                "n_dropped",
            ],
        )

    path = os.environ.get(
        "RECHECK_OUT",
        os.path.join(REPO, "CORRECTNESS_sf100_recheck.json"),
    )
    merged = out
    if os.path.exists(path) and not selftest:
        with open(path) as f:
            prior = json.load(f)
        prior_specs = prior.get("specs", prior)
        prior_specs.update(out)
        merged = prior_specs
    if not selftest:
        with open(path, "w") as f:
            json.dump({"sf_dir": sf_dir, "specs": merged}, f, indent=1)
    n_bad = sum(
        1 for r in out.values()
        if r["err"] or r.get("hash_match") is not True
    )
    print(f"\nsf100_breadth: {len(out)} specs, {n_bad} not exact"
          + ("" if selftest else f" -> {path}"))
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
