"""dbt project surface beyond models: seeds, compiled target/, clean.

The reference's dbt_project.yml declares seed-paths (:17), target-path
(:22) and clean-targets (:23-25) but ships an empty seeds/ dir and no
compile artifacts; these tests pin the engine's supply of those
surfaces (VERDICT r4 missing-items 1-3).
"""

from __future__ import annotations

import json
import os

from gcp_dbt_data_engineering_spark.plans.models import (
    EXAMPLE_MODELS,
    ModelGraph,
    SEED_CSV_PATH,
)


def test_compiled_target_round_trips_example_models(spark, tmp_path):
    """dbt compile parity: the persisted SQL is exactly what executed —
    re-running the compiled text reproduces each model's rows."""
    g = ModelGraph(
        EXAMPLE_MODELS,
        warehouse_dir=str(tmp_path / "wh"),
        target_dir=str(tmp_path / "target"),
    )
    out = g.run(spark)
    cdir = tmp_path / "target" / "compiled"
    assert sorted(p.name for p in cdir.iterdir()) == [
        "my_first_dbt_model.sql",
        "my_second_dbt_model.sql",
    ]
    manifest = json.loads((tmp_path / "target" / "manifest.json").read_text())
    assert manifest["my_first_dbt_model"]["config"]["materialized"] == "table"
    assert manifest["my_second_dbt_model"]["refs"] == ["my_first_dbt_model"]
    for name, df in out.items():
        compiled = (cdir / f"{name}.sql").read_text()
        assert "{{" not in compiled  # fully rendered
        replayed = spark.sql(compiled)
        assert sorted(map(repr, map(tuple, replayed.collect()))) == sorted(
            map(repr, map(tuple, df.collect()))
        )


def test_clean_removes_target_and_warehouse(spark, tmp_path):
    g = ModelGraph(
        EXAMPLE_MODELS,
        warehouse_dir=str(tmp_path / "wh"),
        target_dir=str(tmp_path / "target"),
    )
    g.run(spark)
    assert (tmp_path / "target").exists() and (tmp_path / "wh").exists()
    g.clean()
    assert not (tmp_path / "target").exists()
    assert not (tmp_path / "wh").exists()


def test_seed_from_dir_discovers_csvs(spark, tmp_path):
    """from_dir(seed_path=...) mirrors dbt's seeds/ directory scan; an
    inferSchema seed (no pinned types) still loads and refs resolve."""
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    (seed_dir / "rates.csv").write_text("k,rate\na,1.5\nb,2.5\n")
    model_dir = tmp_path / "models"
    model_dir.mkdir()
    (model_dir / "doubled.sql").write_text(
        "select k, rate * 2 as rate2 from {{ ref('rates') }}"
    )
    g = ModelGraph.from_dir(
        str(model_dir),
        seed_path=str(seed_dir),
        warehouse_dir=str(tmp_path / "wh"),
    )
    out = g.run(spark)
    assert sorted(out) == ["doubled", "rates"]
    got = {r.k: r.rate2 for r in out["doubled"].collect()}
    assert got == {"a": 3.0, "b": 5.0}
    # seed parquet materialized in the warehouse like a table model
    assert os.path.isdir(str(tmp_path / "wh" / "rates"))


def test_seed_fixture_exists_and_ref_resolves(spark, tmp_path):
    """The committed seed fixture loads with pinned types and is
    ref()-able from a model."""
    g = ModelGraph(
        {"n_rows": "select count(*) as n from {{ ref('country_codes') }}"},
        seeds={"country_codes": SEED_CSV_PATH},
        seed_schemas={
            "country_codes": "code string, country string, region_key bigint"
        },
        warehouse_dir=str(tmp_path / "wh"),
    )
    out = g.run(spark)
    assert out["n_rows"].collect()[0]["n"] == 15
    assert dict(out["country_codes"].dtypes)["region_key"] == "bigint"


def test_dbt_node_selection(spark, tmp_path):
    """dbt run --select / --exclude selector parity: name+, +name,
    tag:, union of tokens, exclusion — and ephemeral ancestors always
    render so selected descendants can inline them."""
    models = {
        "raw": "{{ config(materialized='ephemeral', tags='base') }}"
        " select 1 as x union all select 2 as x",
        "stg": "{{ config(tags='base silver') }}"
        " select x from {{ ref('raw') }}",
        "mart_a": "{{ config(tags='gold') }}"
        " select sum(x) as s from {{ ref('stg') }}",
        "mart_b": "select max(x) as m from {{ ref('stg') }}",
    }

    def graph():
        return ModelGraph(models, warehouse_dir=str(tmp_path / "wh"))

    g = graph()
    # selector algebra (driver-side, no execution)
    assert g.select_nodes("stg+") == {"stg", "mart_a", "mart_b"}
    assert g.select_nodes("+mart_a") == {"mart_a", "stg", "raw"}
    assert g.select_nodes("+stg+") == {"raw", "stg", "mart_a", "mart_b"}
    assert g.select_nodes("tag:gold") == {"mart_a"}
    assert g.select_nodes("tag:base") == {"raw", "stg"}
    assert g.select_nodes("mart_a mart_b") == {"mart_a", "mart_b"}
    assert g.select_nodes(None, exclude="mart_b") == {
        "raw", "stg", "mart_a",
    }
    assert g.select_nodes("nope") == set()

    # full run then a selected re-run of one descendant: stg's view
    # exists from the full run, so `mart_a` alone can rebuild
    out = graph().run(spark)
    assert sorted(out) == ["mart_a", "mart_b", "stg"]  # raw is ephemeral
    out2 = graph().run(spark, select="mart_a")
    assert sorted(out2) == ["mart_a"]
    assert out2["mart_a"].collect()[0]["s"] == 3

    # selecting the chain from scratch in a fresh-named graph works
    # because +mart_b pulls stg (and raw inlines as ephemeral)
    out3 = graph().run(spark, select="+mart_b")
    assert sorted(out3) == ["mart_b", "stg"]
    assert out3["mart_b"].collect()[0]["m"] == 2


def test_macros_analyses_and_dir_defaults(spark, tmp_path):
    """The last dbt_project.yml-declared paths: macros/ (text-
    substitution macro expansion, nested), analyses/ (compiled to
    target/, never executed), and the models: per-directory config
    block with longest-prefix resolution and inline-config override."""
    import json
    import os

    proj = tmp_path / "proj"
    (proj / "models" / "example").mkdir(parents=True)
    (proj / "models" / "example" / "deep").mkdir()
    (proj / "macros").mkdir()
    (proj / "analyses").mkdir()
    (proj / "seeds").mkdir()

    (proj / "macros" / "helpers.sql").write_text(
        "{% macro cents(col) %}CAST({{ col }} * 100 AS BIGINT){% endmacro %}\n"
        "{% macro cents_sum(col) %}SUM({{ cents(col) }}){% endmacro %}\n"
    )
    (proj / "models" / "base.sql").write_text(
        "select 1.5 as amount union all select 2.25 as amount"
    )
    (proj / "models" / "example" / "mid.sql").write_text(
        "select {{ cents_sum('amount') }} as total_cents"
        " from {{ ref('base') }}"
    )
    (proj / "models" / "example" / "deep" / "leaf.sql").write_text(
        "{{ config(materialized='view') }}"
        " select total_cents from {{ ref('mid') }}"
    )
    (proj / "analyses" / "audit.sql").write_text(
        "select {{ cents('amount') }} as c from {{ ref('base') }}"
    )

    g = ModelGraph.from_dir(
        str(proj / "models"),
        macro_path=str(proj / "macros"),
        analysis_path=str(proj / "analyses"),
        warehouse_dir=str(tmp_path / "wh"),
        target_dir=str(tmp_path / "target"),
        dir_defaults={
            "example": {"+materialized": "table"},
            "example/deep".replace("/", os.sep): {"materialized": "merge"},
        },
    )
    out = g.run(spark)
    # nested macro expanded through two levels
    assert out["mid"].collect()[0]["total_cents"] == 375
    # dir config: mid (example/) is a table on disk
    assert (tmp_path / "wh" / "mid").is_dir()
    # inline config beats the deepest dir default (merge would have
    # required unique_key and failed)
    assert out["leaf"].collect()[0]["total_cents"] == 375
    assert not (tmp_path / "wh" / "leaf").exists()  # view, not table
    # analyses: compiled, never executed, refs + macros rendered
    compiled = (
        tmp_path / "target" / "compiled" / "analyses" / "audit.sql"
    ).read_text()
    assert "CAST(amount * 100 AS BIGINT)" in compiled
    assert "{{" not in compiled
    manifest = json.loads((tmp_path / "target" / "manifest.json").read_text())
    assert manifest["analysis:audit"]["refs"] == ["base"]
    assert "audit" not in out


def test_example_models_both_materialize_as_tables(spark):
    """Reference parity: under `example: +materialized: table`
    (dbt_project.yml:42) BOTH example models are tables — model 2
    inherits the directory default (an earlier port ran it as view)."""
    from gcp_dbt_data_engineering_spark.plans.models import (
        run_example_project,
    )

    out = run_example_project(spark)
    import os

    for name in ("my_first_dbt_model", "my_second_dbt_model"):
        assert os.path.isdir(f"/root/repo/.artifacts/warehouse/{name}")


def test_dbt_build_failure_isolation_and_interleaved_tests(spark, tmp_path):
    """dbt build semantics: seed -> model -> test in DAG order; an
    erroring model marks its descendants skipped while siblings build;
    schema tests run right after their model and report pass/fail."""
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    (seed_dir / "base_rates.csv").write_text("k,rate\na,1\nb,2\n")
    models = {
        "good": "select k, rate * 10 as r from {{ ref('base_rates') }}",
        "bad": "select boom from {{ ref('base_rates') }}",  # no such col
        "child_of_bad": "select boom from {{ ref('bad') }}",
        "dup": "select 1 as id union all select 1 as id",
    }
    g = ModelGraph(
        models,
        seeds={"base_rates": str(seed_dir / "base_rates.csv")},
        seed_schemas={"base_rates": "k string, rate bigint"},
        warehouse_dir=str(tmp_path / "wh"),
    )
    res = g.build(
        spark,
        schema_tests={
            "good": {"k": ["unique", "not_null"]},
            "dup": {"id": ["unique"]},
        },
    )
    by = {r["node"]: r for r in res}
    assert by["base_rates"] == {
        "node": "base_rates", "kind": "seed", "status": "success",
        "detail": None,
    }
    assert by["good"]["status"] == "success"
    assert by["bad"]["status"] == "error"
    assert by["child_of_bad"]["status"] == "skipped"
    assert by["dup"]["status"] == "success"
    assert by["unique_good_k"]["status"] == "pass"
    assert by["not_null_good_k"]["status"] == "pass"
    assert by["unique_dup_id"]["status"] == "fail"
    assert by["unique_dup_id"]["detail"] == "failed_records=1"
    # no tests ran for the failed/skipped branch
    assert not any(n.endswith("_bad_boom") for n in by)
