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


def test_window_is_fully_oracle_backed():
    """Every window slot must hash-check. Round 5 promoted the last
    rows-only query (multimodal_feature_extract) to a deterministic oracle
    contract, so a rows-only query in the window is now always a mistake."""
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)
    assert len(names) >= WINDOW
    for n in names[:WINDOW]:
        assert n in oracles, f"window slot holds rows-only query {n}"


def test_every_registered_query_has_an_oracle():
    """179/179 contract-backed (VERDICT_r04 ask #2): any future oracle-less
    query must be an explicit, justified NO_ORACLE_TAIL entry, never a
    silent omission."""
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    no_oracle = {n for n in names if n not in oracles}
    assert no_oracle <= set(NO_ORACLE_TAIL), no_oracle - set(NO_ORACLE_TAIL)
    if NO_ORACLE_TAIL:
        tail = names[-len(NO_ORACLE_TAIL):]
        assert set(tail) == set(NO_ORACLE_TAIL)


def test_every_priority_name_is_registered():
    qs = entry.queries()
    missing = [n for n in PRIORITY_ORDER + NO_ORACLE_TAIL if n not in qs]
    assert not missing
