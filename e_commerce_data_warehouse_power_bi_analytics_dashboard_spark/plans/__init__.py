from .catalog import CATALOG, Query, register, get_catalog

__all__ = ["CATALOG", "Query", "register", "get_catalog"]
