from .registry import (  # noqa: F401
    TABLE_DTYPES,
    TABLES,
    load_source,
    load_table,
    register_all,
    spread,
    table_path,
    write_sink,
)
