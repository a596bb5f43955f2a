from .sql_frontend import parse_maplejuice_sql, run_maplejuice_sql

__all__ = ["parse_maplejuice_sql", "run_maplejuice_sql"]
