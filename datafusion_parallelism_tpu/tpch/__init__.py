from .datagen import generate_tables, TABLE_NAMES
from .queries import QUERIES, query_sql

__all__ = ["generate_tables", "TABLE_NAMES", "QUERIES", "query_sql"]
