from .catalog import QuerySpec, catalog, register

__all__ = ["QuerySpec", "catalog", "register"]
