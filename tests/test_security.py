"""Security validator negative tests — the reference's own test
strategy item 4 (SURVEY.md §5: ValueError on bad identifiers, table
names, dates, and forbidden SQL keywords;
``tests/dq_sql_notes.md:284-343``)."""

from __future__ import annotations

import pytest

from gcp_dbt_data_engineering_spark import security as sec
from gcp_dbt_data_engineering_spark.operators.dq import run_sql_tests

SF = "/root/testdata/sf0.001"


def test_identifiers():
    assert sec.validate_identifier("o_orderkey") == "o_orderkey"
    for bad in ("o-key", "1abc;", "a b", "drop table", ""):
        with pytest.raises(ValueError):
            sec.validate_identifier(bad)


def test_table_names():
    assert sec.validate_table_name("proj.raw.orders")
    assert sec.validate_table_name("orders")
    for bad in ("a.b", "a.b.c.d", "x; drop", "pr oj.raw.t"):
        with pytest.raises(ValueError):
            sec.validate_table_name(bad)


def test_fecha():
    assert sec.validate_fecha("2024-01-15") == "2024-01-15"
    for bad in ("15-01-2024", "2024/01/15", "not-a-date", "2024-13-40"):
        with pytest.raises(ValueError):
            sec.validate_fecha(bad)


def test_scan_sql_blocks_keywords():
    assert sec.scan_sql("SELECT COUNT(*) FROM t WHERE x IN ('a')")
    for bad in (
        "DROP TABLE t",
        "SELECT 1; DELETE FROM t",
        "SELECT 1 -- comment",
        "INSERT INTO t VALUES (1)",
        "SELECT 1 /* x */",
    ):
        with pytest.raises(ValueError):
            sec.scan_sql(bad)


def test_scan_sql_no_false_positive_on_substrings():
    # keyword scan is word-boundary aware: 'created'/'updated_at'
    # contain forbidden stems but are legitimate identifiers.
    assert sec.scan_sql("SELECT created, updated_at FROM t")
    # created_at (the reference's own false-positive case) stays legal
    assert sec.scan_sql("created_at IS NOT NULL")


def test_scan_sql_blocks_procedure_prefixes():
    # sp_/xp_ are PREFIXES: the right boundary must not anchor, else
    # sp_executesql slips through (reference forbidden list,
    # tests/dq_sql_notes.md:275-279).
    for bad in ("sp_executesql @x", "EXECUTE xp_cmdshell 'dir'",
                "select xp_cmdshell"):
        with pytest.raises(ValueError):
            sec.scan_sql(bad)
    # but an identifier merely *containing* sp_ mid-word is fine
    assert sec.scan_sql("SELECT disp_name FROM t")
    assert sec.scan_sql("SELECT resp_code FROM t")


def test_validate_config_rejects_injection():
    with pytest.raises(ValueError):
        sec.validate_config(
            {"table_name": "t; drop table users", "tests": {}}
        )
    with pytest.raises(ValueError):
        sec.validate_config(
            {
                "table_name": "customer",
                "tests": {"completeness": ["c_name; --"]},
            }
        )


def test_run_sql_tests_screens_sql(spark):
    with pytest.raises(ValueError):
        run_sql_tests(
            spark,
            [
                {
                    "test_name": "evil",
                    "sql": "DROP TABLE lineitem",
                    "expected_result": 0,
                }
            ],
            SF,
        )


def test_scan_sql_multiline_and_comment_embedded():
    """Wave 7: custom_sql conditions spanning lines. Legit multi-line
    boolean conditions pass; forbidden tokens hiding after newlines or
    inside would-be comments are still caught (the scan is token-
    based, not line-based)."""
    ok = (
        "o_totalprice > 0\n"
        "  AND o_orderdate IS NOT NULL\n"
        "  AND created_at IS NOT NULL"
    )
    assert sec.scan_sql(ok)
    for bad in (
        "o_totalprice > 0\n-- sneaky trailing comment",
        "x = 1 AND\nsp_executesql @p",
        "x = 1\n/* block */ AND y = 2",
        "a=1;\nDROP TABLE t",
        "EXEC\nxp_cmdshell 'x'",
    ):
        with pytest.raises(ValueError):
            sec.scan_sql(bad)


def test_validate_fecha_date_boundaries():
    """Wave 7: calendar edges. Real leap day and year-9999 dates are
    valid; non-leap Feb 29, month 13, and zero-day reject."""
    assert sec.validate_fecha("2096-02-29")  # leap
    assert sec.validate_fecha("9999-12-31")
    assert sec.validate_fecha("0001-01-01")
    for bad in ("2095-02-29", "1995-13-01", "1995-00-10",
                "1995-06-31", "95-06-15", "1995/06/15"):
        with pytest.raises(ValueError):
            sec.validate_fecha(bad)
