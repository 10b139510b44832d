"""Operator surface: importing this package registers every query."""

from . import (  # noqa: F401
    advanced,
    analytics,
    aggregates,
    graphs,
    joins,
    modernsql,
    profiling,
    relational,
    setops,
    timeseries,
    tpch,
    windows,
)
from .registry import QUERY_REGISTRY, QuerySpec, load, query, register_views  # noqa: F401
