"""Every SQL-expressible query must hash-match its DuckDB oracle
(the driver's t2 gate, replicated locally at small sf)."""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE
from .oracle_harness import compare


def _specs():
    import __spark_entry__ as e

    return e._all_specs()


@pytest.mark.parametrize("name", sorted(_specs().keys()))
def test_oracle_match(spark, name):
    spec = _specs()[name]
    df = spec.spark(spark, SF_ORACLE)
    assert df.count() >= 0  # materializes; rows-only check for no-oracle ops
    if spec.oracle is None:
        pytest.skip("non-SQL-expressible op: rows-only check")
    res = compare(df, spec.oracle, SF_ORACLE)
    assert res["match"], res


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"region", "revenue", "n_items"} == set(df.columns)
