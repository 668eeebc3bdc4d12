from .loaders import TABLES, load_table, load_tables, register_views
from .schemas import FIXTURE_SCHEMAS, INSTACART_SCHEMAS

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "FIXTURE_SCHEMAS",
    "INSTACART_SCHEMAS",
]
