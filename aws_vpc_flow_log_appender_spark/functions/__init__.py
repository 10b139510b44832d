from .numeric import round_half_up, sql_round  # noqa: F401
