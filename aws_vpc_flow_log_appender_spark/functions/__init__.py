from .numeric import fdiv_sql, round_half_up, sql_round  # noqa: F401
