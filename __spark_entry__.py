"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the sf0.01 DuckDB correctness gate.

All implementations live in ``gcp_dbt_data_engineering_spark``; this
module only aggregates the per-module spec registries.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from gcp_dbt_data_engineering_spark.plans.spec import QuerySpec


def _evidence_rank() -> dict[str, tuple[int, int]]:
    """Rank each spec by how weak its driver-correctness evidence is.

    The external gate samples the FIRST 50 entries of ``queries()`` each
    round, so iteration order decides which specs accumulate driver-green
    rows. We read the committed ``CORRECTNESS_r*.json`` artifacts and sort
    weakest-evidence first: (0) last driver run was red, (1) never
    driver-sampled, (2) green, oldest round first. This rotates coverage
    across rounds until every spec has a green row.
    """
    rounds: list[tuple[int, dict]] = []
    for p in sorted(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        try:
            rounds.append((int(m.group(1)), json.loads(p.read_text())))
        except (OSError, ValueError):
            continue
    rank: dict[str, tuple[int, int]] = {}
    for rnd, data in sorted(rounds):
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            ok = isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            )
            if ok:
                rank[name] = (2, -rnd)  # green; newer rounds sort later
            elif rank.get(name, (0, 0))[0] != 2:
                rank[name] = (0, -rnd)  # red and never green: first priority
    # Specs whose SEMANTICS changed in a given round after their last
    # driver-green row: that evidence describes the old output, so they
    # outrank everything until a green row from a LATER round lands
    # (builder-side full-oracle gates cover them meanwhile). r8:
    # minhash_coeffs fix; k-means reseeding (avalanched-hash seeds).
    changed_in_round = {
        "dedup_minhash_lsh": 8,
        "similarity_ann_ivf_kmeans": 8,
        "dedup_semantic": 8,
        # r11: size-adaptive LSH banding (similarity.band_geometry)
        # changed the sf0.01 output (500 vectors < the 1000-vector
        # threshold now gets more/narrower bands); the r10 driver-green
        # row describes the old 56x8 geometry
        "similarity_ann_lsh": 11,
    }
    for name, chg_rnd in changed_in_round.items():
        status, neg_rnd = rank.get(name, (1, 0))
        if status != 2 or -neg_rnd < chg_rnd:
            rank[name] = (-1, 0)
    return rank


def _all_specs() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}
    from gcp_dbt_data_engineering_spark.plans import analytics

    modules = [analytics]
    for modname in (
        "gcp_dbt_data_engineering_spark.operators.dq",
        "gcp_dbt_data_engineering_spark.operators.profile",
        "gcp_dbt_data_engineering_spark.operators.dedup",
        "gcp_dbt_data_engineering_spark.operators.similarity",
        "gcp_dbt_data_engineering_spark.operators.semdedup",
        "gcp_dbt_data_engineering_spark.operators.text",
        "gcp_dbt_data_engineering_spark.operators.multimodal",
        "gcp_dbt_data_engineering_spark.operators.pipeline",
        "gcp_dbt_data_engineering_spark.operators.sketch",
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
    rank = _evidence_rank()
    registry_pos = {name: i for i, name in enumerate(specs)}
    ordered = sorted(
        specs,
        key=lambda n: (*rank.get(n, (1, 0)), registry_pos[n]),
    )
    return {name: specs[name] for name in ordered}


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
