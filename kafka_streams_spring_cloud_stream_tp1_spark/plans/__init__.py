from .registry import QUERIES, QuerySpec, oracle_sql_map, queries_map, query  # noqa: F401
