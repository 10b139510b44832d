"""S10 fallback: live geolocation lookups as a memoized, batched Pandas UDF.

The engine's primary geo path is the CIDR-range *join* (enrich.join_geo) —
data, not RPC. This module is the escape hatch for deployments that must call
a live service (the reference calls api.ipstack.com per row, serially,
geocode.js:56-68; its only protection is an API-key cache).

Improvements over the reference, in Spark terms:
 - Arrow-batched: one Python invocation per ~10k rows, not one HTTP await per
   record in a serial loop
 - per-executor memoization: each distinct IP is resolved once per executor
   process per batch of work, not once per row
 - degrade-don't-fail: resolver errors yield NULL geo (the reference's
   June-2017 fix for quota exhaustion, README.md:145) — a bad lookup can
   never fail the batch
 - RFC1918/NULL gating stays in the plan (enrich.is_rfc1918), so private
   sources never reach the resolver

The HTTP client itself is injectable (`resolver`); the default raises — this
container has no network egress, and a real deployment supplies a requests/
urllib-based resolver plus its rate limiting.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEO_RESULT_SCHEMA = T.StructType([
    T.StructField("country_code", T.StringType(), True),
    T.StructField("country_name", T.StringType(), True),
    T.StructField("region_code", T.StringType(), True),
    T.StructField("region_name", T.StringType(), True),
    T.StructField("city", T.StringType(), True),
    T.StructField("latitude", T.DoubleType(), True),
    T.StructField("longitude", T.DoubleType(), True),
])

_FIELDS = [f.name for f in GEO_RESULT_SCHEMA.fields]


def _default_resolver(ip: str) -> dict:
    raise NotImplementedError(
        "live geocoding needs an injected resolver (no network egress here); "
        "use enrich.join_geo with a geo dimension table instead"
    )


def make_geocode_udf(resolver: Callable[[str], dict] | None = None) -> Callable[..., Column]:
    """Build the geocode pandas UDF around an ``ip -> geo dict`` resolver.

    Returns a column function usable as ``geo = geocode_udf(F.col("srcaddr"))``
    producing a GEO_RESULT_SCHEMA struct (NULL fields on resolver failure).
    """
    resolve = resolver or _default_resolver
    cache: dict[str, str] = {}  # executor-local across batches
    max_cache = 100_000  # bound memory on high-cardinality streams

    @F.pandas_udf(T.StringType())
    def _geocode_json(ips: pd.Series) -> pd.Series:
        # Negative cache scoped to THIS Arrow batch (code-review r6): a hot
        # IP the resolver persistently errors on (unallocated range, 403
        # after quota exhaustion — the reference's own README.md:145
        # incident) would otherwise issue one live RPC per ROW, deepening
        # the very quota exhaustion being handled. Batch-local scope keeps
        # failures retryable on the NEXT batch (a durable negative cache
        # would pin a transient outage forever), while bounding calls to
        # one per failing IP per batch.
        failed: set[str] = set()
        out = []
        for ip in ips:
            if ip is None:
                out.append(None)
                continue
            if ip in cache:
                out.append(cache[ip])
                continue
            if ip in failed:
                out.append(None)
                continue
            try:
                geo = resolve(ip)
                value = json.dumps({k: geo.get(k) for k in _FIELDS})
            except Exception:  # degrade, never fail the batch
                failed.add(ip)  # don't re-RPC this IP within the batch
                out.append(None)
                continue
            if len(cache) >= max_cache:
                cache.clear()  # crude but bounded; real deployments use an LRU
            cache[ip] = value
            out.append(value)
        return pd.Series(out)

    def geocode(col: Column) -> Column:
        return F.from_json(_geocode_json(col), GEO_RESULT_SCHEMA)

    return geocode
