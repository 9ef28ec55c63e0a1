from .session import get_spark
from .tables import TABLES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
