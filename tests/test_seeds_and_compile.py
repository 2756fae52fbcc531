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


def test_seed_nodes_obey_select_exclude(spark, tmp_path):
    """ADVICE r5: --select filters seed nodes too — a narrow selection
    must NOT rewrite non-selected seed tables, and seed names are
    selectable tokens (with descendants via `seed+`)."""
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    (seed_dir / "rates.csv").write_text("k,rate\na,1\nb,2\n")
    (seed_dir / "labels.csv").write_text("k,label\na,x\nb,y\n")
    models = {
        "uses_rates": "select sum(rate) as s from {{ ref('rates') }}",
    }
    wh = tmp_path / "wh"
    g = ModelGraph(
        models,
        seeds={
            "rates": str(seed_dir / "rates.csv"),
            "labels": str(seed_dir / "labels.csv"),
        },
        seed_schemas={
            "rates": "k string, rate bigint",
            "labels": "k string, label string",
        },
        warehouse_dir=str(wh),
    )
    # seed names participate in the selector universe
    assert g.select_nodes("rates+") == {"rates", "uses_rates"}
    assert g.select_nodes(None, exclude="labels") == {
        "rates", "uses_rates",
    }
    out = g.run(spark, select="rates+")
    assert sorted(out) == ["rates", "uses_rates"]
    assert not (wh / "labels").exists()  # non-selected seed untouched
    assert (wh / "rates").exists()
    # build() honors the same seed selection
    res = g.build(spark, select="rates")
    assert [r["node"] for r in res] == ["rates"]


def test_schema_tests_batched_single_action(spark, tmp_path):
    """VERDICT r5 item 6: N schema tests of one model run as ONE
    spark.sql action (batched scalar subqueries), not N collects."""
    g = ModelGraph(
        {"m": "select 1 as a, 2 as b union all select 3, null"},
        warehouse_dir=str(tmp_path / "wh"),
    )
    g.run(spark)
    calls = []
    orig = spark.sql

    class _Counting:
        def sql(self, q, *a, **kw):
            calls.append(q)
            return orig(q, *a, **kw)

        def __getattr__(self, item):
            return getattr(spark, item)

    res = g._run_schema_tests(
        _Counting(), "m",
        {"a": ["unique", "not_null"], "b": ["not_null"]},
    )
    assert len(calls) == 1
    by = {r["node"]: r["status"] for r in res}
    assert by == {
        "unique_m_a": "pass",
        "not_null_m_a": "pass",
        "not_null_m_b": "fail",
    }


def test_unknown_schema_test_records_error_and_continues(spark, tmp_path):
    """ADVICE r5: an unknown test name must produce an `error` test row
    (per-node isolation), not abort the whole build."""
    g = ModelGraph(
        {"m": "select 1 as a", "n": "select 2 as b"},
        warehouse_dir=str(tmp_path / "wh"),
    )
    res = g.build(
        spark,
        schema_tests={
            "m": {"a": ["accepted_values", "not_null"]},
            "n": {"b": ["unique"]},
        },
    )
    by = {r["node"]: r["status"] for r in res}
    assert by["accepted_values_m_a"] == "error"
    assert by["not_null_m_a"] == "pass"
    assert by["unique_n_b"] == "pass"  # later nodes still ran
    assert by["m"] == "success" and by["n"] == "success"


def test_macro_param_does_not_rewrite_ref_targets():
    """ADVICE r5: a macro param whose name collides with text in a
    non-call {{ ... }} expression (e.g. a ref target) must not be
    substituted there, nor inside string-literal args of nested
    calls."""
    from gcp_dbt_data_engineering_spark.plans.models import (
        expand_macros,
        parse_macros,
    )

    macros = parse_macros(
        "{% macro pick(x) %}"
        "select {{ x }} from {{ ref('x') }} "
        "where note = {{ quote('x fixed') }}"
        "{% endmacro %}\n"
        "{% macro quote(s) %}'{{ s }}'{% endmacro %}"
    )
    out = expand_macros("{{ pick(col_a) }}", macros)
    assert "select col_a from" in out
    assert "ref('x')" in out or "from x" not in out  # target intact
    assert "'x fixed'" in out  # literal arg untouched


def test_macro_literal_args_with_commas_stay_whole():
    """ADVICE r6: a string-literal argument containing a comma must
    not be fragmented by the arg-list split — it is ONE literal, at a
    top-level call and inside nested-call substitution alike."""
    from gcp_dbt_data_engineering_spark.plans.models import (
        _split_args_quote_aware,
        expand_macros,
        parse_macros,
    )

    assert _split_args_quote_aware("'a, b', c") == ["'a, b'", " c"]
    assert _split_args_quote_aware('x, "p, q", y') == [
        "x", ' "p, q"', " y",
    ]
    # SQL-style doubled-quote escape stays inside the literal
    assert _split_args_quote_aware("'it''s, fine', z") == [
        "'it''s, fine'", " z",
    ]

    macros = parse_macros(
        "{% macro outer(c) %}"
        "select {{ inner(c, 'a, c') }}"
        "{% endmacro %}\n"
        "{% macro inner(col, lit) %}{{ col }} || {{ lit }}{% endmacro %}"
    )
    out = expand_macros("{{ outer(k) }}", macros)
    # param substituted positionally; the comma-bearing literal intact
    # (Jinja renders the literal's VALUE at the call site)
    assert out == "select k || a, c"

    # top-level call: one literal arg with a comma is ONE argument
    macros2 = parse_macros(
        "{% macro fmt(s) %}format('{{ s }}'){% endmacro %}"
    )
    assert expand_macros("{{ fmt('x, y') }}", macros2) == "format('x, y')"


def test_selected_model_pulls_its_seed_dependency(spark, tmp_path):
    """ADVICE r6: in a fresh session, --select model_x (no '+') where
    model_x refs a seed must still register the seed view; the seed is
    loaded but NOT reported as a run/built node."""
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    (seed_dir / "rates.csv").write_text("k,rate\na,1\nb,2\n")
    (seed_dir / "labels.csv").write_text("k,label\na,x\nb,y\n")
    wh = tmp_path / "wh"
    g = ModelGraph(
        {"uses_rates": "select sum(rate) as s from {{ ref('rates') }}"},
        seeds={
            "rates": str(seed_dir / "rates.csv"),
            "labels": str(seed_dir / "labels.csv"),
        },
        seed_schemas={
            "rates": "k string, rate bigint",
            "labels": "k string, label string",
        },
        warehouse_dir=str(wh),
    )
    spark.sql("DROP VIEW IF EXISTS rates")
    out = g.run(spark, select="uses_rates")
    assert sorted(out) == ["uses_rates"]  # seed loaded, not reported
    assert out["uses_rates"].collect()[0].s == 3
    assert not (wh / "labels").exists()  # unrelated seed untouched
    # build(): same — seed registered, status rows only for selected
    spark.sql("DROP VIEW IF EXISTS rates")
    res = g.build(spark, select="uses_rates")
    assert [r["node"] for r in res] == ["uses_rates"]
    assert res[0]["status"] == "success"


def test_source_resolution_and_unknown_source_errors(spark, tmp_path):
    """{{ source('s','t') }} resolves through sources.yml identifiers;
    an undeclared source is a compile error (dbt parity)."""
    spark.sql("select 42 as v").createOrReplaceTempView("raw_tbl")
    g = ModelGraph(
        {"m": "select v from {{ source('lake', 'thing') }}"},
        warehouse_dir=str(tmp_path / "wh"),
        sources={"lake": {"thing": {"identifier": "raw_tbl"}}},
    )
    out = g.run(spark)
    assert out["m"].collect()[0]["v"] == 42

    bad = ModelGraph(
        {"m": "select v from {{ source('lake', 'missing') }}"},
        warehouse_dir=str(tmp_path / "wh"),
        sources={"lake": {"thing": {}}},
    )
    import pytest

    with pytest.raises(KeyError, match="missing"):
        bad.run(spark)


def test_is_incremental_guard_and_full_refresh(spark, tmp_path):
    """The {% if is_incremental() %} block renders only when the
    target exists and the run is not --full-refresh; {{ this }} reads
    the model's prior state."""
    model = {
        "acc": (
            "{{ config(materialized='incremental',"
            " partition_by='d') }}"
            " select d, n from batch"
            " {% if is_incremental() %}"
            " where d > (select max(d) from {{ this }})"
            " {% endif %}"
        ),
    }
    wh = str(tmp_path / "wh")

    def set_batch(rows):
        spark.createDataFrame(
            rows, "d string, n bigint"
        ).createOrReplaceTempView("batch")

    g = ModelGraph(model, warehouse_dir=wh)
    set_batch([("2024-01-01", 1), ("2024-01-02", 2)])
    g.run(spark)
    # incremental run: old day re-delivered with a WRONG value — the
    # guard must discard it; the new day lands
    set_batch([("2024-01-01", 99), ("2024-01-03", 3)])
    g.run(spark)
    def table():
        # partition-column inference reads d back as DATE; normalize
        return {
            r["d"]: r["n"]
            for r in spark.read.parquet(f"{wh}/acc")
            .selectExpr("cast(d as string) as d", "n")
            .collect()
        }

    assert table() == {
        "2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 3,
    }
    # full refresh: guard off, table rebuilt from the current batch
    g.run(spark, full_refresh=True)
    assert table() == {"2024-01-01": 99, "2024-01-03": 3}


def test_pre_post_hooks_run_in_order(spark, tmp_path):
    """dbt pre-/post-hooks (project-level, like +pre-hook blocks):
    pre runs before the model (it can stage an input relation), post
    runs after registration (it can read {{ this }})."""
    g = ModelGraph(
        {"m": "select v * 2 as v2 from staged_in"},
        warehouse_dir=str(tmp_path / "wh"),
        hooks={
            "m": {
                "pre": [
                    "create or replace temp view staged_in as "
                    "select 21 as v"
                ],
                "post": [
                    "create or replace temp view m_audit as "
                    "select count(*) as n, max(v2) as mx from {{ this }}"
                ],
            }
        },
    )
    out = g.run(spark)
    assert out["m"].collect()[0]["v2"] == 42
    audit = spark.table("m_audit").collect()[0]
    assert (audit["n"], audit["mx"]) == (1, 42)


def test_store_failures_materializes_violating_rows(spark, tmp_path):
    """dbt build --store-failures: a failing test writes its violating
    rows to a warehouse table named after the test node; passing tests
    write nothing."""
    wh = tmp_path / "wh"
    g = ModelGraph(
        {
            "m": (
                "select * from (values (1, 'a'), (1, 'b'), (2, null))"
                " as t(id, tag)"
            ),
        },
        warehouse_dir=str(wh),
    )
    res = g.build(
        spark,
        schema_tests={"m": {"id": ["unique"], "tag": ["not_null"]}},
        store_failures=True,
    )
    by = {r["node"]: r for r in res}
    assert by["unique_m_id"]["status"] == "fail"
    assert by["unique_m_id"]["failures_table"] == "unique_m_id"
    assert by["not_null_m_tag"]["status"] == "fail"
    dupes = spark.table("unique_m_id").collect()
    assert [(r["id"], r["n_records"]) for r in dupes] == [(1, 2)]
    nulls = spark.table("not_null_m_tag").collect()
    assert len(nulls) == 1 and nulls[0]["id"] == 2
    assert (wh / "dq_failures" / "unique_m_id").exists()
    # passing tests leave no artifact
    assert not (wh / "dq_failures" / "unique_m_tag").exists()


def test_seed_dependency_walks_through_ephemeral(spark, tmp_path):
    """ADVICE r7: --select mart, where mart refs an EPHEMERAL staging
    model that itself refs a seed. The ephemeral renders and inlines
    into mart's SQL, so the seed view must be loaded even though mart
    never refs it directly — one hop deeper than the r6 direct-ref
    fix."""
    from gcp_dbt_data_engineering_spark.plans.models import ModelGraph

    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    (seed_dir / "eph_rates.csv").write_text("k,rate\na,1\nb,2\n")
    g = ModelGraph(
        {
            "stg_rates": (
                "{{ config(materialized='ephemeral') }} "
                "select rate from {{ ref('eph_rates') }}"
            ),
            "mart": "select sum(rate) as s from {{ ref('stg_rates') }}",
        },
        seeds={"eph_rates": str(seed_dir / "eph_rates.csv")},
        seed_schemas={"eph_rates": "k string, rate bigint"},
        warehouse_dir=str(tmp_path / "wh"),
    )
    spark.sql("DROP VIEW IF EXISTS eph_rates")
    out = g.run(spark, select="mart")
    assert sorted(out) == ["mart"]  # seed loaded but not reported
    assert out["mart"].collect()[0].s == 3
    # build path shares _seeds_for: same transitive pull
    spark.sql("DROP VIEW IF EXISTS eph_rates")
    res = g.build(spark, select="mart")
    assert [r["node"] for r in res] == ["mart"]
    assert res[0]["status"] == "success"


def test_dependency_seed_load_error_is_reported(spark, tmp_path):
    """ADVICE r7: a dependency seed that fails to load must surface an
    error row (kind 'seed (dependency)') so the downstream skip has a
    visible root cause."""
    from gcp_dbt_data_engineering_spark.plans.models import ModelGraph

    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()  # note: broken.csv intentionally absent on disk
    g = ModelGraph(
        {"m": "select sum(rate) as s from {{ ref('broken') }}"},
        seeds={"broken": str(seed_dir / "broken.csv")},
        seed_schemas={"broken": "k string, rate bigint"},
        warehouse_dir=str(tmp_path / "wh"),
    )
    spark.sql("DROP VIEW IF EXISTS broken")
    res = g.build(spark, select="m")
    by = {r["node"]: r for r in res}
    assert by["broken"]["kind"] == "seed (dependency)"
    assert by["broken"]["status"] == "error"
    assert by["m"]["status"] == "skipped"
    assert "broken" in by["m"]["detail"]


def test_seed_csv_quoted_newlines_and_doubled_quotes(spark, tmp_path):
    """Wave 7: RFC-4180 seeds. A quoted field containing a newline and
    a doubled-quote escape must load as ONE row with the literal
    content — Spark's CSV defaults tore `"United\\nStates"` into two
    rows (no multiLine) and kept the doubled quotes verbatim (escape
    defaults to backslash), silently diverging from DuckDB / dbt's
    seed loader. models._seed_reader pins multiLine + quote-escape."""
    import duckdb

    seed = tmp_path / "countries.csv"
    seed.write_text(
        'code,name\n'
        'US,"United\nStates"\n'
        'FR,"France ""la belle"""\n'
        'DE,Germany\n'
    )
    g = ModelGraph(
        {},
        warehouse_dir=str(tmp_path / "wh"),
        seeds={"countries": str(seed)},
        seed_schemas={"countries": "code string, name string"},
    )
    out = g.seed(spark)
    got = sorted(map(tuple, out["countries"].collect()))
    want = sorted(
        map(tuple, duckdb.sql(
            f"SELECT * FROM read_csv('{seed}', header=true, "
            "columns={'code': 'VARCHAR', 'name': 'VARCHAR'})"
        ).fetchall())
    )
    assert got == want
    assert ("US", "United\nStates") in got
    assert ("FR", 'France "la belle"') in got
