"""dbt-docs parity: schema.yml descriptions render into a manifest +
catalog (reference models/example/schema.yml:4-21 — round-3 VERDICT
noted descriptions were parsed for tests but rendered nowhere)."""

from __future__ import annotations

from gcp_dbt_data_engineering_spark.plans.docs import (
    generate_docs,
    load_schema_info,
    render_markdown,
    write_docs,
)
from gcp_dbt_data_engineering_spark.plans.models import (
    EXAMPLE_MODELS,
    ModelGraph,
)

#: same shape/content class as the reference's schema.yml (public
#: starter boilerplate) — model + column descriptions with tests
SCHEMA_YML = """
version: 2

models:
    - name: my_first_dbt_model
      description: "A starter dbt model"
      columns:
          - name: id
            description: "The primary key for this table"
            tests:
                - unique
                - not_null

    - name: my_second_dbt_model
      description: "A starter dbt model"
      columns:
          - name: id
            description: "The primary key for this table"
            tests:
                - unique
                - not_null
"""


def test_schema_info_parses_reference_shape():
    info = load_schema_info(SCHEMA_YML)
    assert set(info) == {"my_first_dbt_model", "my_second_dbt_model"}
    col = info["my_first_dbt_model"]["columns"]["id"]
    assert col["description"] == "The primary key for this table"
    assert col["tests"] == ["unique", "not_null"]


def test_generate_docs_manifest_and_catalog(spark, tmp_path):
    graph = ModelGraph(EXAMPLE_MODELS)
    docs = generate_docs(graph, spark, load_schema_info(SCHEMA_YML))

    m1 = docs["manifest"]["my_first_dbt_model"]
    m2 = docs["manifest"]["my_second_dbt_model"]
    assert m1["config"]["materialized"] == "table"  # per-model override
    assert m2["depends_on"] == ["my_first_dbt_model"]
    assert m1["description"] == "A starter dbt model"
    # catalog records the OBSERVED warehouse schema
    cat_cols = {c["name"]: c for c in docs["catalog"]["my_first_dbt_model"]["columns"]}
    assert "id" in cat_cols and cat_cols["id"]["dtype"] in ("int", "bigint")

    md = render_markdown(docs)
    assert "## my_second_dbt_model" in md
    assert "The primary key for this table" in md
    assert "unique, not_null" in md
    assert "depends on: `my_first_dbt_model`" in md

    jpath, mpath = write_docs(docs, str(tmp_path / "docs"))
    assert open(mpath).read() == md
    import json

    assert json.load(open(jpath))["manifest"]["my_second_dbt_model"][
        "depends_on"
    ] == ["my_first_dbt_model"]
