"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the sf0.01 DuckDB correctness gate.

All implementations live in ``gcp_dbt_data_engineering_spark``; this
module only aggregates the per-module spec registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_dbt_data_engineering_spark.plans.spec import QuerySpec


def _all_specs() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}
    from gcp_dbt_data_engineering_spark.plans import analytics

    modules = [analytics]
    for modname in (
        "gcp_dbt_data_engineering_spark.operators.dq",
        "gcp_dbt_data_engineering_spark.operators.profile",
        "gcp_dbt_data_engineering_spark.operators.dedup",
        "gcp_dbt_data_engineering_spark.operators.similarity",
        "gcp_dbt_data_engineering_spark.operators.text",
        "gcp_dbt_data_engineering_spark.operators.multimodal",
        "gcp_dbt_data_engineering_spark.operators.pipeline",
        "gcp_dbt_data_engineering_spark.plans.models",
        "gcp_dbt_data_engineering_spark.plans.windows",
        "gcp_dbt_data_engineering_spark.plans.stats",
        "gcp_dbt_data_engineering_spark.plans.tpch_shapes",
        "gcp_dbt_data_engineering_spark.plans.layout",
        "gcp_dbt_data_engineering_spark.streaming.events",
    ):
        try:
            import importlib

            modules.append(importlib.import_module(modname))
        except ImportError:
            continue  # module not built yet this round
    for mod in modules:
        specs.update(getattr(mod, "SPECS", {}))
    return specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gcp_dbt_data_engineering_spark.plans.analytics import revenue_by_region

    return revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in _all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _all_specs().items()
        if spec.oracle is not None
    }
