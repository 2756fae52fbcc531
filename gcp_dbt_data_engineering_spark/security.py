"""Input validation for user-supplied DQ config (SQL-injection guard).

Re-implements the contract of the reference's
``DataQualitySecurityValidator`` (``tests/dq_sql_notes.md:268-343``):
identifier whitelist, forbidden-keyword scan over custom SQL, table-name
pattern, and strict ``YYYY-MM-DD`` date validation — every check raises
``ValueError`` with the offending value, matching the reference's
negative-test surface (``tests/dq_sql_notes.md:284-317``).

Differences from the reference, on purpose:

- table names accept both warehouse-style 3-part names
  (``project.dataset.table``) and this engine's registry names
  (bare ``lineitem``), since the parquet registry replaces BigQuery.
- the keyword scan matches on word boundaries instead of bare substring
  containment — the reference's ``'create' in sql`` rejects legitimate
  predicates like ``created_at IS NOT NULL`` (false positive) while
  still being trivially bypassed with comments; word-boundary matching
  at least fixes the false positives. Still defense-in-depth only: the
  engine additionally never interpolates unvalidated strings into SQL.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any

IDENTIFIER_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")
TABLE_3PART_RE = re.compile(
    r"^[a-zA-Z0-9_-]+\.[a-zA-Z0-9_-]+\.[a-zA-Z0-9_-]+$"
)

#: statement-level keywords that have no business inside a boolean
#: test condition (reference list, dq_sql_notes.md:275-279)
FORBIDDEN_SQL_KEYWORDS = frozenset(
    {
        "drop", "truncate", "delete", "insert", "update", "create",
        "alter", "exec", "execute", "sp_", "xp_", "grant", "revoke",
        "merge", "bulk", "openquery", "openrowset", "dbcc", ";", "--",
        "/*",
    }
)


def validate_table_name(table_name: str) -> str:
    if TABLE_3PART_RE.match(table_name) or IDENTIFIER_RE.match(table_name):
        return table_name
    raise ValueError(f"Invalid table name format: {table_name}")


def validate_identifier(name: str) -> str:
    if not IDENTIFIER_RE.match(name):
        raise ValueError(f"Invalid column name: {name}")
    return name


def validate_columns(columns: list[str]) -> list[str]:
    for c in columns:
        validate_identifier(c)
    return columns


def validate_fecha(fecha: str) -> str:
    try:
        datetime.strptime(fecha, "%Y-%m-%d")
    except (ValueError, TypeError):
        raise ValueError(f"Invalid date format: {fecha}") from None
    return fecha


def scan_sql(sql: str) -> str:
    lowered = sql.lower()
    for kw in FORBIDDEN_SQL_KEYWORDS:
        if kw.endswith("_"):
            # prefix keywords (sp_/xp_): the trailing underscore IS part
            # of the following identifier, so only the left edge anchors
            # — a right boundary would make the pattern unmatchable
            # (regression vs the reference's substring scan, which
            # rejects sp_executesql / xp_cmdshell).
            hit = re.search(rf"(?<![a-z0-9_]){re.escape(kw)}", lowered)
        elif kw.isalnum() or "_" in kw:
            hit = re.search(rf"(?<![a-z0-9_]){re.escape(kw)}(?![a-z0-9_])", lowered)
        else:
            hit = kw in lowered
        if hit:
            raise ValueError(f"Forbidden SQL keyword detected: {kw}")
    return sql


def validate_config(config: dict[str, Any]) -> dict[str, Any]:
    """Validate a full DQ job config before any SQL is built from it."""
    validate_table_name(config["table_name"])
    if config.get("fecha") is not None:
        validate_fecha(str(config["fecha"]))
    if config.get("date_column") is not None:
        validate_identifier(config["date_column"])
    tests = config.get("tests", {})
    validate_columns(tests.get("completeness", []))
    for combo in tests.get("uniqueness", []):
        validate_columns(list(combo))
    for col in tests.get("format", {}):
        validate_identifier(col)
    for col in tests.get("range", {}):
        validate_identifier(col)
    for custom in tests.get("custom_sql", []):
        scan_sql(custom.get("sql_condition", custom.get("sql", "")))
        if not IDENTIFIER_RE.match(custom.get("test_name", "")):
            raise ValueError(
                f"Invalid test name: {custom.get('test_name')!r}"
            )
    return config
