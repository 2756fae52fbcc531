from .registry import TABLES, load_table, register_all, table_path  # noqa: F401
