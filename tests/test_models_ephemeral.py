"""Ephemeral materialization: dbt's inline-CTE model type.

An ephemeral model is never executed or registered — its rendered SQL
inlines as a subquery wherever downstream models ref() it. These tests
pin that contract, including an ephemeral-over-ephemeral chain.
"""

from __future__ import annotations

from gcp_dbt_data_engineering_spark.plans.models import ModelGraph
from gcp_dbt_data_engineering_spark.sources import register_all

SF = "/root/testdata/sf0.01"

GRAPH = {
    "recent_orders": """
{{ config(materialized='ephemeral') }}
select o_custkey, o_totalprice from orders
where o_orderdate >= timestamp '1998-01-01'
""",
    "big_recent_orders": """
{{ config(materialized='ephemeral') }}
select * from {{ ref('recent_orders') }} where o_totalprice > 1000
""",
    "cust_recent_spend": """
{{ config(materialized='view') }}
select o_custkey, count(*) as n, sum(cast(o_totalprice as decimal(22,6)))
  as spend
from {{ ref('big_recent_orders') }}
group by o_custkey
""",
}


def test_ephemeral_chain_inlines(spark):
    register_all(spark, SF, tables=("orders",))
    out = ModelGraph(GRAPH).run(spark)
    # ephemeral models are not materialized nor returned
    assert set(out) == {"cust_recent_spend"}
    assert not spark.catalog.tableExists("recent_orders")
    assert not spark.catalog.tableExists("big_recent_orders")
    # result equals the hand-inlined query
    expect = spark.sql("""
        select o_custkey, count(*) as n,
               sum(cast(o_totalprice as decimal(22,6))) as spend
        from orders
        where o_orderdate >= timestamp '1998-01-01'
          and o_totalprice > 1000
        group by o_custkey
    """)
    got = sorted(map(tuple, out["cust_recent_spend"].collect()))
    assert got == sorted(map(tuple, expect.collect()))
    assert len(got) > 100
