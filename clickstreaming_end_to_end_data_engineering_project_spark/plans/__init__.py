from .registry import QuerySpec, all_specs, oracle_sql, queries  # noqa: F401
