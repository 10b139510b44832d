"""Graph analytics over a deterministic communication graph.

The reference's flow logs form a src->dst communication graph; at real scale
the questions asked of it are graph-shaped: who talks to whom (degree), how
clustered is the traffic (triangles), which hosts are structurally central
(PageRank). Edges here are synthesized from the events table with pure
column arithmetic (same trick as flagship.synth_flow_lines) so every query
is DuckDB-oracle-checkable on driver-shared inputs: node ids live on a
circulant support ``(a, a + d mod N)`` with N=499, d in 1..30, which keeps
the distinct edge set bounded at 14,970 forever — the graph SATURATES with
corpus growth instead of densifying, so join fan-out stays dim-sized at any
scale factor while degree/triangle structure stays non-degenerate even at
sf0.001.

PageRank is the iterative showpiece: all arithmetic is scaled-integer
(rank * 1e12, floor division), so per-node sums are order-independent and
the Spark driver loop and the DuckDB unrolled-CTE oracle agree bit-for-bit
— no float accumulation-order hazard across 5 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query

_N = 499       # node modulus (prime, so offset orbits cover all nodes)
_OFF = 30      # circulant offsets 1.._OFF
# Driver-collect safety bound for the folded graph queries (ADVICE r10 #1):
# the circulant construction emits at most _N * _OFF distinct edges, and the
# collects below cap at _EDGE_BOUND + 1 rows so an unbounded regression
# raises instead of OOMing the driver.
_EDGE_BOUND = _N * _OFF

_SQL_EDGES = f"""
  SELECT DISTINCT event_id % {_N} AS src,
         (event_id % {_N} + 1 + (event_id * 17) % {_OFF}) % {_N} AS dst
  FROM events
"""

_SQL_UEDGES = """
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM de
"""


def _directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> distinct directed edges on the circulant support."""
    e = load(spark, sf_dir, "events")
    a = F.col("event_id") % _N
    d = F.lit(1) + (F.col("event_id") * 17) % _OFF
    return e.select(a.alias("src"), ((a + d) % _N).alias("dst")).distinct()


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    de = _directed_edges(spark, sf_dir)
    return de.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()


@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH de AS ({_SQL_EDGES}),
    ue AS ({_SQL_UEDGES}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM ue UNION ALL SELECT v FROM ue)
      GROUP BY node
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    """,
    tags=("graph", "agg"),
)
def graph_degree_distribution(spark, sf_dir):
    """Degree histogram of the undirected communication graph: the first
    structural profile of any large graph (hubs vs leaves, skew for join
    planning). Two shuffles — endpoint-count keyed by node, then histogram
    keyed by degree — both partial-aggregated map-side; the second operates
    on at most |V| rows however big the corpus."""
    ue = _undirected_edges(spark, sf_dir)
    deg = (
        ue.select(F.col("u").alias("node"))
        .unionAll(ue.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH de AS ({_SQL_EDGES}),
    ue AS ({_SQL_UEDGES})
    SELECT CAST((SELECT count(*) FROM ue) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM
                   (SELECT u AS node FROM ue UNION SELECT v FROM ue))
                AS BIGINT) AS n_nodes,
           CAST((SELECT count(*)
                 FROM ue e1
                 JOIN ue e2 ON e1.v = e2.u
                 JOIN ue e3 ON e3.u = e1.u AND e3.v = e2.v)
                AS BIGINT) AS n_triangles
    """,
    tags=("graph", "join"),
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting via the canonical ordered-wedge join: with edges
    stored as u < v, path e1(u,v) + e2(v,w) closed by e3(u,w) counts each
    triangle exactly once. Two equi-joins keyed on node ids — the standard
    distributed formulation (each wedge is checked where its closing edge
    hashes), no broadcast of the full edge set needed at scale since both
    joins are edge-to-edge shuffles. Deduplicating edges FIRST bounds the
    wedge fan-out by the true degree, not the raw flow count."""
    ue = _undirected_edges(spark, sf_dir).localCheckpoint()
    e1 = ue.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = ue.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = ue.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    wedges = e1.join(e2, F.col("b") == F.col("b2"))
    tris = wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    nodes = ue.select(F.col("u").alias("node")).union(
        ue.select(F.col("v").alias("node"))
    ).distinct()
    return (
        ue.agg(F.count("*").alias("n_edges"))
        .crossJoin(nodes.agg(F.count("*").alias("n_nodes")))
        .crossJoin(tris.agg(F.count("*").alias("n_triangles")))
    )


_SCALE = 1_000_000_000_000  # integer rank scale (1e12; sums stay << 2^63)
_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration PageRank as chained CTEs (DuckDB's recursive
    form disallows the per-iteration aggregate); HUGEINT sums cast back to
    BIGINT each round per the engine-portability discipline."""
    parts = [
        f"de AS ({_SQL_EDGES})",
        "nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
        "outd AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM de GROUP BY src)",
        f"base AS (SELECT CAST(({15 * _SCALE} // (100 * n)) AS BIGINT) AS b,"
        f" CAST(({_SCALE} // n) AS BIGINT) AS r0 FROM nn)",
        "r0 AS (SELECT node, (SELECT r0 FROM base) AS rank FROM nodes)",
    ]
    for k in range(_ITERS):
        parts.append(
            f"c{k} AS (SELECT e.dst AS node,"
            f" CAST(sum(r.rank // o.outdeg) AS BIGINT) AS s"
            f" FROM de e JOIN r{k} r ON e.src = r.node"
            f" JOIN outd o ON o.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT n.node,"
            f" CAST((SELECT b FROM base) + (85 * coalesce(c.s, 0)) // 100"
            f" AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)"
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
    SELECT node, rank,
           CAST(row_number() OVER (ORDER BY rank DESC, node) AS INTEGER) AS pr_rank
    FROM r{_ITERS}
    QUALIFY pr_rank <= 25
    ORDER BY pr_rank
    """
    )


@query("graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def graph_pagerank(spark, sf_dir):
    """PageRank (d=0.85, 5 iterations) over the directed communication
    graph, driver-folded (optimization r10, guide §1.2 "the distributed
    algorithm" + the Lloyd-fold precedent in ext/similarity): the distinct
    edge set is MATHEMATICALLY bounded at _N x _OFF = 14,970 rows at any
    corpus scale (circulant support — see the module docstring), i.e. it is
    dim-sized state of the same order a broadcast join would already put on
    the driver. The corpus-scaled work — the DISTINCT over the events scan
    — stays distributed (one map-side-combined aggregate); the 5 fixed
    rounds then run on the driver over the collected edge list with exact
    Python integers, and the 25-row result returns as a local relation.

    Before the fold the 5 rounds were an unrolled 15-join lazy plan: 74
    Exchange nodes, 23 jobs, every stage under 100 ms — pure orchestration
    latency (profiled r10: 1.9-2.9 s wall with no stage over 93 ms). The
    fold leaves ONE distributed job (edges) + a trivial local sort.

    All ranks are scaled integers (x 1e12) with floor division per
    contribution — order-independent, and Python ``//`` on nonnegative
    ints is bit-identical to SQL ``div`` — so the fold reproduces the
    unrolled-CTE oracle exactly. Dangling mass is dropped (nodes without
    out-edges absorb rank), matching the oracle; top-25 by rank with
    node-id tiebreak."""
    from pyspark.sql import types as T

    # Bound BEFORE materializing (ADVICE r10 #1): limit(bound + 1) caps what
    # the driver can ever receive, so if the edge derivation stops being
    # circulant-bounded this raises instead of OOMing the driver first (and
    # unlike an assert it survives python -O). The limit is a no-op today:
    # the circulant construction emits at most _N * _OFF distinct edges.
    edges = [
        (r[0], r[1])
        for r in _directed_edges(spark, sf_dir).limit(_EDGE_BOUND + 1).collect()
    ]
    if len(edges) > _EDGE_BOUND:
        raise RuntimeError(
            f"pagerank edge derivation exceeded the circulant bound {_EDGE_BOUND}"
        )
    schema = T.StructType(
        [
            T.StructField("node", T.LongType(), True),
            T.StructField("rank", T.LongType(), True),
            T.StructField("pr_rank", T.IntegerType(), False),
        ]
    )
    node_set = {s for s, _ in edges} | {d for _, d in edges}
    if not node_set:
        return spark.createDataFrame([], schema)
    n = len(node_set)
    b = (15 * _SCALE) // (100 * n)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = dict.fromkeys(node_set, _SCALE // n)
    for _ in range(_ITERS):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // outdeg[s]
        rank = {v: b + (85 * contrib.get(v, 0)) // 100 for v in node_set}
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    rows = [(int(v), int(r), i + 1) for i, (v, r) in enumerate(top)]
    return spark.createDataFrame(rows, schema)


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH de AS ({_SQL_EDGES}),
    ue AS ({_SQL_UEDGES}),
    adj AS (
      SELECT u AS n, v AS nb FROM ue UNION ALL SELECT v, u FROM ue
    ),
    wedges AS (
      SELECT a.n AS u, b.n AS w, CAST(count(*) AS BIGINT) AS n_common
      FROM adj a JOIN adj b ON a.nb = b.nb AND a.n < b.n
      GROUP BY a.n, b.n
    ),
    candidates AS (
      SELECT w.u, w.w, w.n_common
      FROM wedges w
      LEFT JOIN ue e ON e.u = w.u AND e.v = w.w
      WHERE e.u IS NULL
    )
    SELECT u, w, n_common,
           CAST(row_number() OVER (ORDER BY n_common DESC, u, w) AS INTEGER) AS rnk
    FROM candidates
    QUALIFY rnk <= 20
    ORDER BY rnk
    """,
    tags=("graph", "join"),
)
def graph_common_neighbors(spark, sf_dir):
    """Link prediction by common-neighbor count: the top non-adjacent node
    pairs sharing the most neighbors (the classical 'people you may know'
    score). Wedge enumeration is an equi-join of the symmetrized adjacency
    list with itself on the shared neighbor, aggregated per candidate pair;
    existing edges drop out with a left-anti hash join. Wedge fan-out is
    sum(deg^2) — bounded here by the saturating circulant support, and the
    shape to sample or cap per-node on a power-law graph (same hot-cell
    discipline as the IVF sub-bucketing in ext/similarity)."""
    from pyspark.sql import Window as W

    ue = _undirected_edges(spark, sf_dir).localCheckpoint()
    adj = ue.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionAll(
        ue.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    a = adj.alias("a")
    b = adj.alias("b")
    wedges = (
        a.join(b, (F.col("a.nb") == F.col("b.nb")) & (F.col("a.n") < F.col("b.n")))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("w"))
        .agg(F.count("*").alias("n_common"))
    )
    candidates = wedges.join(
        ue,
        (wedges.u == ue.u) & (wedges.w == ue.v),
        "left_anti",
    )
    rank_w = W.orderBy(F.desc("n_common"), F.asc("u"), F.asc("w"))
    return (
        candidates.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


_BFS_HOPS = 3       # fixed hop budget (deterministic at every SF)
_SRC_MOD = 50       # sources = nodes with node % _SRC_MOD == 0 (10 of 499)


def _bfs_oracle() -> str:
    """Unrolled multi-source BFS as chained CTEs (same discipline as the
    PageRank oracle: DuckDB's recursive form is path-enumerating under
    UNION ALL and aggregate-restricted under UNION, so a fixed hop budget
    unrolls cleanly instead). Each round: frontier joins the symmetric
    adjacency, minus every node already labeled."""
    parts = [
        f"de AS ({_SQL_EDGES})",
        f"ue AS ({_SQL_UEDGES})",
        "sym AS (SELECT u AS a, v AS b FROM ue"
        " UNION ALL SELECT v AS a, u AS b FROM ue)",
        "nodes AS (SELECT DISTINCT a AS node FROM sym)",
        f"d0 AS (SELECT node, 0 AS dist FROM nodes"
        f" WHERE node % {_SRC_MOD} = 0)",
        "f0 AS (SELECT node FROM d0)",
    ]
    for h in range(1, _BFS_HOPS + 1):
        parts.append(
            f"n{h} AS (SELECT DISTINCT s.b AS node"
            f" FROM sym s JOIN f{h - 1} f ON s.a = f.node"
            f" WHERE s.b NOT IN (SELECT node FROM d{h - 1}))"
        )
        parts.append(
            f"d{h} AS (SELECT node, dist FROM d{h - 1}"
            f" UNION ALL SELECT node, {h} AS dist FROM n{h})"
        )
        parts.append(f"f{h} AS (SELECT node FROM n{h})")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
    SELECT node, CAST(dist AS INTEGER) AS dist FROM d{_BFS_HOPS}
    """
    )


@query("graph_shortest_paths", oracle=_bfs_oracle(), tags=("graph", "iterative"))
def graph_shortest_paths(spark, sf_dir):
    """Multi-source BFS: hop distance from every node to its NEAREST seed
    (nodes ≡ 0 mod 50 — think 'known-compromised hosts', the blast-radius
    question asked as a distance field instead of a reachable set), hop
    budget fixed at 3. The third iterative-graph primitive beside PageRank
    (fixed-point scoring) and connected components (pointer jumping):
    label propagation with a frontier.

    Distributed shape — the textbook scalable BFS, one round per hop:
     - the FRONTIER (nodes labeled last round, nothing else) equi-joins the
       checkpointed symmetric adjacency on the source endpoint: shuffle
       cost tracks |frontier| x avg-degree, never |V|;
     - a left-anti join against the accumulated label table keeps the
       frontier minimal (a node reached twice is never re-expanded — the
       property that makes BFS O(|E|) total work across all rounds instead
       of O(|E| x rounds));
     - rounds are O(hop budget), each one shuffle — but unlike
       graph_pagerank's linear recurrence (round h references round h-1
       exactly once, so the whole loop stays one lazy plan), BFS
       references the prior state TWICE per round (anti-join + union),
       which doubles the recompute DAG every hop; each round's frontier
       is therefore lineage-cut with a lazy localCheckpoint, making total
       work linear in the hop budget (measured at H=3: the uncut single
       plan carried 33 exchanges from the doubled lineage; cut, each
       round materializes once and the final plan is one exchange over
       cached frontiers). The convergence-driven sibling of this skeleton
       is ext/graph.connected_components.
    Hop distances are exact small integers — no float, no tie ambiguity
    (min-dist per node is unique by construction since a node enters the
    label table exactly once, in its first reachable round).

    Driver-folded (optimization r10, same rationale and bound as
    graph_pagerank above): the undirected edge set is mathematically
    capped at _N x _OFF rows at any scale, so the BFS rounds — previously
    14 jobs of per-hop join + anti-join + checkpoint over sub-millisecond
    stages — run on the driver over the collected adjacency; only the
    DISTINCT over the events scan stays distributed. Integer hop labels
    have no arithmetic hazards at all; the fold is trivially exact."""
    from pyspark.sql import types as T

    # Bound BEFORE materializing (ADVICE r10 #1, same pattern as pagerank):
    # cap the collect at bound + 1 rows and raise on overflow instead of
    # asserting after the driver already holds an unbounded result.
    ue = [
        (r[0], r[1])
        for r in _undirected_edges(spark, sf_dir).limit(_EDGE_BOUND + 1).collect()
    ]
    if len(ue) > _EDGE_BOUND:
        raise RuntimeError(
            f"BFS edge derivation exceeded the circulant bound {_EDGE_BOUND}"
        )
    adj: dict[int, list[int]] = {}
    for u, v in ue:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    dist = {v: 0 for v in adj if v % _SRC_MOD == 0}
    frontier = list(dist)
    for h in range(1, _BFS_HOPS + 1):
        nxt = []
        for u in frontier:
            for w in adj[u]:
                if w not in dist:
                    dist[w] = h
                    nxt.append(w)
        frontier = nxt
    schema = T.StructType(
        [
            T.StructField("node", T.LongType(), True),
            T.StructField("dist", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(v), d) for v, d in dist.items()], schema
    )
