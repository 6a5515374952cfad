from .tpch import TABLES, load_raw, read_table
from .star import StarSchema, STAR_CTE_SQL, with_star

__all__ = ["TABLES", "load_raw", "read_table", "StarSchema", "STAR_CTE_SQL", "with_star"]
