"""Enrich stage: ENI security-group join, direction, geolocation range join.

Reference behavior (decorator/index.js:163-197):
 - per-row nested-loop lookup of interface-id in the ENI mapping (J1, :167-173)
 - direction = destaddr == eni.ipAddress ? inbound : outbound (:170); rows with
   no ENI match get NO direction (stays NULL here)
 - geocode(srcaddr) skipped for RFC1918 sources or when disabled (:175-177)
 - geo fields appended with ''/0 defaults when no geo data (:182-190)

Spark-first design:
 - J1 -> broadcast LEFT OUTER equi join; deterministic-match discipline via
   a stable-ordered row_number on the build side (lodash.find returns the
   first match; see first_match_dim).
 - J2 (per-row HTTP geo lookup) -> a *data* join against a CIDR-range geo
   dimension: prefix-bucketed equi join + range filter, broadcast. At 100 TB
   the naive (ip BETWEEN start AND end) range join is O(n*m); bucketing by /16
   prefix makes it an equi join with a tiny residual filter and keeps the dim
   broadcastable (a real GeoIP table explodes to ~a few million bucket rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC1918 predicate — replicates decorator/index.js:149-153 EXACTLY, including
# its quirk of classifying loopback 127/8 as "private" (SURVEY §2.2 P8).
RFC1918_PATTERN = (
    r"(^127\.)|(^10\.)|(^172\.1[6-9]\.)|(^172\.2[0-9]\.)|(^172\.3[0-1]\.)|(^192\.168\.)"
)


def is_rfc1918(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(RFC1918_PATTERN)


def ip_to_int(col: Column | str) -> Column:
    """Dotted-quad IPv4 -> uint32 as long, pure Column arithmetic (no UDF).

    try_cast per octet: the flow-line regex's address capture is an
    unbounded ``\\d+`` quad, so a regex-valid line can carry an octet that
    overflows int64 — under Spark 4 ANSI defaults a plain cast would crash
    the batch. Octets are additionally RANGE-CHECKED to 0..255: an address
    like '1.2.3.300' is regex-valid but its positional arithmetic would
    alias onto a DIFFERENT valid address's integer (1.2.4.44) and geolocate
    the row to a concrete wrong range, where the reference's geocoder gets
    no data and degrades to the ''/0 defaults (code-review r6) — any
    out-of-range or overflowing octet now yields NULL and falls into the
    geo-miss path."""
    c = F.col(col) if isinstance(col, str) else col
    o = F.split(c, r"\.")
    octs = [o.getItem(i).try_cast("long") for i in range(4)]
    valid = None
    for oc in octs:
        ok = oc.isNotNull() & (oc >= 0) & (oc <= 255)
        valid = ok if valid is None else (valid & ok)
    return F.when(
        valid,
        octs[0] * F.lit(16777216) + octs[1] * F.lit(65536)
        + octs[2] * F.lit(256) + octs[3],
    )


def first_match_dim(eni_dim: DataFrame, key: str = "interfaceId") -> DataFrame:
    """lodash.find takes the FIRST match (decorator/index.js:167). 'First' in
    API-listing order is unknowable once distributed, so the enforced
    discipline is *deterministic*-match: one row per key chosen by a stable
    value ordering (bare dropDuplicates keeps whichever row the hash
    aggregate meets first — flip-flopping sg-ids/direction across runs)."""
    from pyspark.sql import Window as W

    others = [c for c in eni_dim.columns if c != key]
    w = W.partitionBy(key).orderBy(*[F.asc_nulls_last(c) for c in others])
    return (
        eni_dim.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def join_eni(parsed: DataFrame, eni_dim: DataFrame) -> DataFrame:
    """J1: broadcast left-outer equi join replacing the O(rows*enis)
    nested-loop lookup (decorator/index.js:167-173).

    Adds `security-group-ids` (NULL on miss) and `direction`
    (inbound/outbound; NULL on miss — the reference only sets direction
    inside the match branch, :169-173).
    """
    dim = first_match_dim(eni_dim)
    joined = parsed.join(
        F.broadcast(dim),
        parsed["interface-id"] == dim["interfaceId"],
        "left",
    )
    matched = dim["interfaceId"].isNotNull()
    # ipAddress is an array (the jmespath [?Primary] filter yields a singleton
    # list, decorator/index.js:89); JS `==` coerces ['x'] == 'x' true, so the
    # comparison is against the first element (SURVEY §7.4.2). try_element_at,
    # not element_at: a real ENI with no Primary=true IPv4 (IPv6-only) yields
    # an EMPTY array, and element_at on it raises under ANSI, killing the
    # batch — the JS `[] == destaddr` evaluates false -> 'outbound', which is
    # exactly where try_element_at's NULL lands the comparison
    # (code-review r6).
    direction = F.when(
        matched,
        F.when(
            F.col("destaddr") == F.try_element_at(dim["ipAddress"], F.lit(1)),
            F.lit("inbound"),
        ).otherwise(F.lit("outbound")),
    )
    return (
        joined
        .withColumn("security-group-ids", dim["securityGroupIds"])
        .withColumn("direction", direction)
        .drop("interfaceId", "securityGroupIds", "ipAddress")
    )


def flatten_geo_dim(geo_dim: DataFrame) -> DataFrame:
    """Rewrite a possibly-overlapping range dimension into DISJOINT ranges,
    each carrying the attributes of its most specific (narrowest) covering
    source range.

    Real GeoIP feeds nest ranges (country superset + city subset); joining
    facts against overlapping ranges would duplicate records. Doing the
    de-overlap ONCE on the small dimension side keeps the fact-side join a
    plain broadcast probe — the alternative (per-record post-join dedup)
    costs a fact-sized shuffle at every query.

    Classic boundary sweep: every start / end+1 becomes a breakpoint;
    consecutive breakpoints form candidate intervals; each interval takes the
    narrowest source range containing it (uncovered gaps drop out).

    Scale posture (the module docstring promises a few-million-row GeoIP
    feed): both sweep steps are bucketed by /8 IP prefix so nothing runs on
    one core or as a nested loop —
     - "next breakpoint" = lead() within each /8 bucket, patched across
       bucket boundaries with a 256-row bucket spine (the only global window
       runs on that spine, not the data);
     - the interval→covering-range match is an equi join on the interval's
       /8 bucket against ranges exploded into the /8 buckets they span
       (complete because intervals never cross a breakpoint, hence never a
       range boundary: interval ⊆ range ⟹ the interval's start bucket is
       among the range's spanned buckets), with the BETWEEN containment as a
       residual filter — a hash/sort-merge join, not BroadcastNestedLoop.
    """
    from pyspark.sql import Window as W

    shift = F.lit(2 ** 24)  # /8 prefix buckets (≤256 distinct)
    points = (
        geo_dim.select(F.col("start_ip_int").alias("p"))
        .union(geo_dim.select((F.col("end_ip_int") + 1).alias("p")))
        .distinct()
        .withColumn("__bkt", (F.col("p") / shift).cast("long"))
    )
    in_bucket = W.partitionBy("__bkt").orderBy("p")
    # Tiny spine: one row per occupied /8 bucket; its global window sorts
    # ≤256 rows, so the single partition is bounded regardless of dim size.
    spine = (
        points.groupBy("__bkt").agg(F.min("p").alias("__bmin"))
        .withColumn("__next_bmin", F.lead("__bmin").over(W.orderBy("__bkt")))
        .select("__bkt", "__next_bmin")
    )
    iv = (
        points.withColumn("__next_in_bkt", F.lead("p").over(in_bucket))
        .join(F.broadcast(spine), "__bkt")
        .withColumn("next_p", F.coalesce("__next_in_bkt", "__next_bmin"))
        .filter(F.col("next_p").isNotNull())
        .select(F.col("p").alias("f_start"), (F.col("next_p") - 1).alias("f_end"))
        .withColumn("__f_bkt", (F.col("f_start") / shift).cast("long"))
    )
    exploded = geo_dim.withColumn(
        "__r_bkt",
        F.explode(
            F.sequence(
                (F.col("start_ip_int") / shift).cast("long"),
                (F.col("end_ip_int") / shift).cast("long"),
            )
        ),
    )
    covered = iv.join(
        F.broadcast(exploded),
        (iv["__f_bkt"] == exploded["__r_bkt"])
        & (iv["f_start"] >= exploded["start_ip_int"])
        & (iv["f_end"] <= exploded["end_ip_int"]),
    ).drop("__f_bkt", "__r_bkt")
    attrs = [f.name for f in geo_dim.schema.fields
             if f.name not in ("start_ip_int", "end_ip_int")]
    # tie-break THROUGH the attribute columns: a dirty feed carrying the
    # same [start, end] twice with conflicting attributes would otherwise
    # pick an arbitrary winner per shuffle (the flip-flop hazard
    # first_match_dim eliminates for the ENI dim; code-review r6)
    most_specific = W.partitionBy("f_start").orderBy(
        F.asc(F.col("end_ip_int") - F.col("start_ip_int")),
        F.asc("start_ip_int"),
        *[F.asc_nulls_last(a) for a in attrs],
    )
    return (
        covered.withColumn("__rn", F.row_number().over(most_specific))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("f_start").alias("start_ip_int"),
            F.col("f_end").alias("end_ip_int"),
            *attrs,
        )
    )


def bucket_geo_dim(geo_dim: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Explode each CIDR range into the /prefix_bits buckets it spans so the
    range join becomes an equi join on bucket + residual BETWEEN filter."""
    shift = F.lit(2 ** (32 - prefix_bits))
    return geo_dim.withColumn(
        "ip_bucket",
        F.explode(
            F.sequence(
                (F.col("start_ip_int") / shift).cast("long"),
                (F.col("end_ip_int") / shift).cast("long"),
            )
        ),
    )


def join_geo(df: DataFrame, geo_dim: DataFrame, src_col: str = "srcaddr",
             geolocation_enabled: bool = True, prefix_bits: int = 16,
             dim_is_disjoint: bool = False) -> DataFrame:
    """J2: geolocation as a broadcast prefix-bucketed range join.

    Replaces the serial per-row HTTP lookup (decorator/index.js:175-177,
    geocode.js:56-68). The enrichment gate (env flag + RFC1918 source,
    decorator/index.js:175-177) is applied as join-input pruning: gated rows
    never enter the join. Geo columns default to ''/0 — never NULL
    (decorator/index.js:182-190), including for gated and unmatched rows.

    ``geolocation_enabled`` is resolved at plan-build time (SURVEY §4.3) —
    when False the join is statically pruned from the plan entirely.
    """
    geo_defaults = {
        "source-country-code": F.lit(""),
        "source-country-name": F.lit(""),
        "source-region-code": F.lit(""),
        "source-region-name": F.lit(""),
        "source-city": F.lit(""),
        "source-location": F.struct(
            F.lit(0.0).alias("lat"), F.lit(0.0).alias("lon")
        ),
    }
    if not geolocation_enabled:
        for name, default in geo_defaults.items():
            df = df.withColumn(name, default)
        return df

    gate = (~is_rfc1918(src_col)) & F.col(src_col).isNotNull()
    shift = F.lit(2 ** (32 - prefix_bits))
    # de-overlap the dimension ONCE (dim-sized work) so each fact row can
    # match at most one range — no post-join dedup shuffle on the fact side.
    # Callers that pre-flatten (e.g. streaming, where the static dim would
    # otherwise be re-swept every micro-batch) pass dim_is_disjoint=True.
    prepared = geo_dim if dim_is_disjoint else flatten_geo_dim(geo_dim)
    bucketed = bucket_geo_dim(prepared, prefix_bits)
    ip_int = F.when(gate, ip_to_int(src_col))
    df = df.withColumn("__ip_int", ip_int).withColumn(
        "__ip_bucket", (F.col("__ip_int") / shift).cast("long")
    )
    cond = (
        (df["__ip_bucket"] == bucketed["ip_bucket"])
        & (df["__ip_int"] >= bucketed["start_ip_int"])
        & (df["__ip_int"] <= bucketed["end_ip_int"])
    )
    joined = df.join(F.broadcast(bucketed), cond, "left")
    out = (
        joined
        .withColumn("source-country-code", F.coalesce(bucketed["country_code"], F.lit("")))
        .withColumn("source-country-name", F.coalesce(bucketed["country_name"], F.lit("")))
        .withColumn("source-region-code", F.coalesce(bucketed["region_code"], F.lit("")))
        .withColumn("source-region-name", F.coalesce(bucketed["region_name"], F.lit("")))
        .withColumn("source-city", F.coalesce(bucketed["city"], F.lit("")))
        .withColumn(
            "source-location",
            F.struct(
                F.coalesce(bucketed["latitude"], F.lit(0.0)).alias("lat"),
                F.coalesce(bucketed["longitude"], F.lit(0.0)).alias("lon"),
            ),
        )
        .drop(
            "ip_bucket", "start_ip_int", "end_ip_int", "country_code",
            "country_name", "region_code", "region_name", "city",
            "latitude", "longitude", "__ip_int", "__ip_bucket",
        )
    )
    return out


def project_eni_dim(ec2_raw: DataFrame) -> DataFrame:
    """The jmespath projection (decorator/index.js:85-90) as array functions:

    ``NetworkInterfaces[].{interfaceId: NetworkInterfaceId,
    securityGroupIds: Groups[].GroupId,
    ipAddress: PrivateIpAddresses[?Primary].PrivateIpAddress}``
    """
    return ec2_raw.select(
        F.col("NetworkInterfaceId").alias("interfaceId"),
        F.transform("Groups", lambda g: g["GroupId"]).alias("securityGroupIds"),
        F.transform(
            F.filter("PrivateIpAddresses", lambda p: p["Primary"]),
            lambda p: p["PrivateIpAddress"],
        ).alias("ipAddress"),
    )
