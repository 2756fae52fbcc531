from .registry import (  # noqa: F401
    TABLE_DTYPES,
    TABLES,
    load_table,
    register_all,
    spread,
    table_path,
)
