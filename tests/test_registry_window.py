"""Driver-window invariants: the correctness gate checks the FIRST 50
registry entries, so rotation mistakes (unregistered names, a rows-only
query burning a hash-checked slot, duplicates) must fail CI, not the round."""

import __spark_entry__ as entry
from aws_vpc_flow_log_appender_spark.operators.registry import (
    NO_ORACLE_TAIL,
    PRIORITY_ORDER,
)

WINDOW = 50


def test_priority_names_unique():
    assert len(PRIORITY_ORDER) == len(set(PRIORITY_ORDER))


def test_window_is_oracle_backed_except_final_slot():
    """Slots 1-49 must hash-check; slot 50 is deliberately the one
    rows-only-by-design query (multimodal_feature_extract, env-dependent
    features) so it gets a driver row without burning a hash slot."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)
    assert len(names) >= WINDOW
    for n in names[: WINDOW - 1]:
        assert n in oracles, f"window slot holds rows-only query {n}"


def test_no_oracle_queries_sit_at_the_tail_or_final_slot():
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    no_oracle = {n for n in names if n not in oracles}
    allowed = set(NO_ORACLE_TAIL) | {names[WINDOW - 1]}
    assert no_oracle <= allowed, no_oracle - allowed
    if NO_ORACLE_TAIL:
        tail = names[-len(NO_ORACLE_TAIL):]
        assert set(tail) == set(NO_ORACLE_TAIL)


def test_every_priority_name_is_registered():
    qs = entry.queries()
    missing = [n for n in PRIORITY_ORDER + NO_ORACLE_TAIL if n not in qs]
    assert not missing
