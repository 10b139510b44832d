"""Skew-mitigation helpers: salted aggregation and salted joins.

Flow-log keys are Zipfian (one chatty host can be 10% of a 100 TB day).
AQE's skew-join splitting handles the join case at runtime; these helpers are
the explicit fallback for (a) skewed groupBys, which AQE does NOT split, and
(b) deployments pinning AQE off. Salting trades one extra (cheap, pre-reduced)
shuffle for eliminating the hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(df: DataFrame, key_cols: list[str],
                     agg_cols: dict[str, str],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-proof aggregation: groupBy(key, salt) -> partial sums
    -> groupBy(key) -> final sums.

    ``agg_cols`` maps input column -> output alias; sums and counts only
    (they re-aggregate losslessly). Each summed column also gets a non-null
    count ``n_<alias>`` so a downstream mean is sum/n_<alias> — using the
    row count for a nullable column would understate it. The hot key's rows
    spread over ``n_salts`` reducers in phase 1; phase 2 reduces n_salts
    pre-aggregated rows per key — trivially balanced.
    """
    salt = (F.rand(seed=0) * n_salts).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            *[F.sum(src).alias(f"__s_{alias}") for src, alias in agg_cols.items()],
            *[F.count(src).alias(f"__c_{alias}") for src, alias in agg_cols.items()],
            F.count("*").alias("__s_n"),
        )
    )
    return phase1.groupBy(*key_cols).agg(
        *[F.sum(f"__s_{alias}").alias(alias) for alias in agg_cols.values()],
        *[F.sum(f"__c_{alias}").alias(f"n_{alias}") for alias in agg_cols.values()],
        F.sum("__s_n").alias("n_rows"),
    )


def salted_join(facts: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof equi join for when the dim is too big to broadcast and one
    fact key is hot: replicate each dim row n_salts times (tagged), salt the
    fact side randomly, join on (key, salt). The hot key's probe rows spread
    across n_salts reducers instead of one.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # replicated dim rows that fail to match would each survive a
        # right/full outer join -> n_salts copies of every unmatched dim row
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    dim_rep = dim.select("*", salts)
    facts_salted = facts.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    out = facts_salted.join(dim_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Profile helper: the top-N heaviest keys (run on a sample at scale)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(top_n)
    )
