"""Graph analytics over relational tables: PageRank on the co-purchase
graph.

The reference has no graph surface; this family generalizes its
iterative refinement loop (the RCR re-fit cycle, continuum.py:85-94)
to the classic distributed-graph primitive, the same way
``kmeans_embeddings`` generalizes it to clustering: every iteration is
a join + aggregation expressed relationally, so Catalyst plans it and
1000 executors run it with ZERO driver round trips (ranks stay a
DataFrame end-to-end; nothing is collected).

Graph construction: parts bought together in one order are linked
(the co-purchase graph every recommender bootstrap builds). The
lineitem self-join on l_orderkey is bounded fan-out — TPC-H orders
have <= 7 lines, so each order emits <= 42 directed pairs; at 100 TB
the join is one shuffle on l_orderkey and never quadratic. Edges are
symmetric by construction, so every node has out-degree >= 1 and the
dangling-mass term of textbook PageRank is identically zero — the
plain update r' = (1-d)/N + d * sum(r_src / outdeg_src) is exact.

Each iteration: one shuffle keyed on src (rank join) and one keyed on
dst (contribution aggregation, partial-agg map side). The node count
N rides along as a broadcast one-row DataFrame (a scalar subquery in
the oracle), not a driver-side constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radio_data_pipeline_spark.functions.graph_ops import triangle_stats
from radio_data_pipeline_spark.operators.ordering import bounded_sort
from radio_data_pipeline_spark.plans.registry import register
from radio_data_pipeline_spark.sources.parquet import load_table

_DAMPING = 0.85
_PR_ITERS = 2


def _iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank round as a DuckDB CTE body."""
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             0.15 / (SELECT n FROM n)
               + {_DAMPING} * sum({prev}.pr / deg.out_deg) AS pr
      FROM e
      JOIN {prev} ON e.src = {prev}.node
      JOIN deg ON e.src = deg.src
      GROUP BY e.dst
    )"""


# Shared co-purchase edge builders (round-4 dedup: triangle/kcore/LPA
# each had a verbatim copy; the edge definition now lives ONCE per
# engine side).
_UND_SQL = """
    und AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    )"""


def _copurchase_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges (u < v) — the bounded
    fan-out lineitem self-join every graph query starts from."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.least("a.l_partkey", "b.l_partkey").alias("u"),
                F.greatest("a.l_partkey", "b.l_partkey").alias("v"))
        .distinct()
    )


def _copurchase_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (s, t) adjacency, lazily checkpointed: the iterative
    queries (kcore, LPA) read it every round, so the distinct-edge
    build materializes once instead of per round."""
    und = _copurchase_und(spark, sf_dir)
    adj = (und.select(F.col("u").alias("s"), F.col("v").alias("t"))
           .unionAll(und.select(F.col("v").alias("s"),
                                F.col("u").alias("t"))))
    return adj.localCheckpoint(eager=False)


@register(
    "pagerank_copurchase",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
            FROM e GROUP BY src),
    n AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM n) AS pr FROM deg),
    {_iter_sql("r0", "r1")},
    {_iter_sql("r1", "r2")}
    SELECT r2.node AS part, deg.out_deg, round(r2.pr, 8) AS pagerank
    FROM r2 JOIN deg ON r2.node = deg.src
    ORDER BY part
    """,
    doc="PageRank (d=0.85, 2 unrolled iterations, uniform init) on the "
        "part co-purchase graph: parts sharing an order are linked "
        "both ways. Bounded-fanout self-join builds edges; each "
        "iteration is [join ranks on src -> aggregate contributions "
        "on dst]; N is a broadcast one-row DataFrame, so no driver "
        "round trips. Symmetric edges mean no dangling nodes and the "
        "plain update rule is exact. Oracle unrolls the identical "
        "rounds as CTEs.",
    tags=("graph", "iterative", "join"),
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))

    ranks = (deg.select(F.col("src").alias("node"))
             .crossJoin(F.broadcast(n))
             .select("node", (F.lit(1.0) / F.col("n")).alias("pr")))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("out_deg")).alias("mass"))
        )
        ranks = (contrib.crossJoin(F.broadcast(n))
                 .select("node",
                         (F.lit(0.15) / F.col("n")
                          + F.lit(_DAMPING) * F.col("mass")).alias("pr")))

    return (
        ranks.join(deg, ranks["node"] == deg["src"])
        .select(F.col("node").alias("part"), "out_deg",
                F.round("pr", 8).alias("pagerank"))
        .orderBy("part")
    )


@register(
    "triangle_count_copurchase",
    oracle="""
    WITH und AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      GROUP BY node
    ),
    k AS (SELECT node, ROW(d, node) AS okey FROM deg),
    o AS (
      SELECT CASE WHEN ku.okey < kv.okey THEN und.u ELSE und.v END AS src,
             CASE WHEN ku.okey < kv.okey THEN kv.okey ELSE ku.okey END
               AS dst_key,
             CASE WHEN ku.okey < kv.okey THEN und.v ELSE und.u END AS dst
      FROM und JOIN k ku ON und.u = ku.node
               JOIN k kv ON und.v = kv.node
    ),
    tri AS (
      SELECT count(*) AS t
      FROM o e1 JOIN o e2
        ON e1.src = e2.src AND e1.dst_key < e2.dst_key
      JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    wedge AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT w FROM wedge) AS BIGINT) AS n_wedges,
           CASE WHEN (SELECT w FROM wedge) > 0
                THEN round(3.0 * (SELECT t FROM tri)
                           / (SELECT w FROM wedge), 6)
           END AS global_clustering
    """,
    doc="Exact triangle count + global clustering coefficient on the "
        "co-purchase graph via the degree-ordered node-iterator: every "
        "undirected edge is oriented from the (degree, id)-smaller "
        "endpoint, wedges are enumerated by self-joining oriented "
        "edges on their source, and a triangle is a wedge whose far "
        "endpoints are themselves an oriented edge. The orientation is "
        "THE scale move — it bounds every node's out-neighborhood by "
        "O(sqrt(edges)) (arboricity), so hub nodes of a power-law "
        "graph cannot explode the wedge join the way a naive "
        "all-neighbor self-join does. Three edge-keyed hash joins, no "
        "driver round trips; the (deg,id) order is a struct key on "
        "both sides (Spark struct(d,node), oracle ROW(d,node)) so the "
        "comparison is collision-proof for node ids of any magnitude.",
    tags=("graph", "join", "triangles"),
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_stats(_copurchase_und(spark, sf_dir))


@register(
    "copurchase_degree_dist",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    b AS (SELECT CAST(floor(ln(d) / ln(2)) AS BIGINT) AS log2_bucket,
                 d FROM deg)
    SELECT log2_bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM b
    GROUP BY log2_bucket
    ORDER BY log2_bucket
    """,
    doc="Degree distribution of the co-purchase graph in log2 buckets "
        "— the first diagnostic run before any graph algorithm at "
        "scale: a heavy power-law tail means the contribution "
        "aggregation in PageRank (and any neighborhood join) needs "
        "skew handling for hub nodes, while a capped distribution "
        "(this graph: order fan-out is bounded) means plain hash "
        "partitioning holds. Same bounded-fanout edge build as "
        "pagerank_copurchase, one degree aggregation, one tiny "
        "bucket aggregation.",
    tags=("graph", "diagnostics", "skew"),
)
def copurchase_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    deg = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"))
        .distinct()
        .groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.groupBy(F.floor(F.log(F.col("d").cast("double"))
                            / F.log(F.lit(2.0))).cast("bigint")
                    .alias("log2_bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
             F.min("d").cast("bigint").alias("min_degree"),
             F.max("d").cast("bigint").alias("max_degree"))
        .transform(bounded_sort, "log2_bucket")
    )


_KCORE_K = 100
_KCORE_ROUNDS = 3

_KCORE_ADJ = _UND_SQL + """,
    adj AS (SELECT u AS s, v AS t FROM und
            UNION ALL SELECT v, u FROM und)
"""


@register(
    "kcore_copurchase",
    oracle=f"""
    WITH {_KCORE_ADJ},
    a0 AS (SELECT DISTINCT s AS node FROM adj),
    d1 AS (SELECT s AS node, count(*) AS d FROM adj
           JOIN a0 x ON adj.s = x.node JOIN a0 y ON adj.t = y.node
           GROUP BY s),
    a1 AS (SELECT node FROM d1 WHERE d >= {_KCORE_K}),
    d2 AS (SELECT s AS node, count(*) AS d FROM adj
           JOIN a1 x ON adj.s = x.node JOIN a1 y ON adj.t = y.node
           GROUP BY s),
    a2 AS (SELECT node FROM d2 WHERE d >= {_KCORE_K}),
    d3 AS (SELECT s AS node, count(*) AS d FROM adj
           JOIN a2 x ON adj.s = x.node JOIN a2 y ON adj.t = y.node
           GROUP BY s),
    a3 AS (SELECT node FROM d3 WHERE d >= {_KCORE_K})
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM a0)),
      (CAST(1 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM a1)),
      (CAST(2 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM a2)),
      (CAST(3 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM a3))
    ) AS t(round, n_alive)
    ORDER BY round
    """,
    doc=f"Iterative k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} "
        "unrolled rounds) on the co-purchase graph — the classic "
        "dense-subgraph filter (community cores, spam-cluster "
        "detection) completing the graph family next to PageRank, "
        "triangles and components. Each round recomputes degrees over "
        "edges whose BOTH endpoints survive, then drops nodes under "
        "k: two semi-join-shaped hash joins keyed on the edge "
        "endpoints plus one partial-aggregated degree count — the "
        "whole loop is lazy DataFrame composition, zero driver "
        "round-trips, and the edge table shuffles ONCE per side per "
        "round on the node key (at 100 TB: iterate to fixpoint with "
        "a convergence check on the alive count instead of a fixed "
        "unroll; each round's cost SHRINKS as the graph peels — "
        "measured here 2000 -> 1512 -> 749 -> 0 alive). The oracle "
        "unrolls the identical rounds as CTEs.",
    tags=("graph", "iterative", "kcore"),
)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    adj = _copurchase_adj(spark, sf_dir)

    alive = adj.select(F.col("s").alias("node")).distinct()
    counts = [alive.agg(F.count(F.lit(1)).alias("n_alive"))
              .select(F.lit(0).cast("bigint").alias("round"),
                      F.col("n_alive").cast("bigint"))]
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = (
            adj.join(alive.withColumnRenamed("node", "s"), "s")
            .join(alive.withColumnRenamed("node", "t"), "t")
            .groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        )
        # lazy localCheckpoint: each round's alive set is REUSED by
        # both its count aggregate and the next round's two joins —
        # without truncation the unioned plan re-executes every
        # earlier round per consumer (r4 ADVICE: 48 shuffles for 3
        # rounds), and the docstring's per-round-cost-shrinks claim
        # is false. eager=False defers materialization to first use;
        # lineage truncates from then on. (localCheckpoint is
        # non-reliable storage — at cluster scale an executor loss
        # mid-query fails the job and a retry recomputes; acceptable
        # for an iterative interactive query, use checkpoint() on a
        # reliable FS for multi-hour jobs.)
        alive = (deg.filter(F.col("d") >= _KCORE_K)
                 .select(F.col("s").alias("node"))
                 .localCheckpoint(eager=False))
        counts.append(
            alive.agg(F.count(F.lit(1)).alias("n_alive"))
            .select(F.lit(r).cast("bigint").alias("round"),
                    F.col("n_alive").cast("bigint")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out.transform(bounded_sort, "round")


_LPA_ROUNDS = 2

_LPA_STEP = """
    {out} AS (
      SELECT node, label FROM (
        SELECT adj.s AS node, {prev}.label,
               count(*) AS c,
               row_number() OVER (
                 PARTITION BY adj.s
                 ORDER BY count(*) DESC, {prev}.label) AS rn
        FROM adj JOIN {prev} ON adj.t = {prev}.node
        GROUP BY adj.s, {prev}.label
      ) WHERE rn = 1
    )"""


@register(
    "lpa_communities_copurchase",
    oracle=f"""
    WITH {_KCORE_ADJ},
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM adj),
    {_LPA_STEP.format(prev="l0", out="l1")},
    {_LPA_STEP.format(prev="l1", out="l2")}
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_member,
           CAST(max(node) AS BIGINT) AS max_member
    FROM l2
    GROUP BY label
    ORDER BY n_members DESC, community
    """,
    doc=f"Synchronous label propagation ({_LPA_ROUNDS} unrolled "
        "rounds, deterministic: each node adopts its neighbors' "
        "modal label, ties to the smallest) on the co-purchase graph "
        "— the community-detection primitive a cluster-based dedup "
        "pipeline runs over its near-duplicate pair graph to pick "
        "one representative per community. Per round: one edge-keyed "
        "join, one (node, label) count with map-side partials, and a "
        "row_number mode pick riding the SAME node partitioning — "
        "two shuffles per round, labels never leave the cluster. The "
        "mode update is the structural difference from PageRank's "
        "sum and kcore's threshold: together the three span the "
        "aggregate-shapes an iterative graph engine must support. "
        "Oracle unrolls identical rounds as CTEs.",
    tags=("graph", "iterative", "communities"),
)
def lpa_communities_copurchase(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    adj = _copurchase_adj(spark, sf_dir)

    labels = adj.select(F.col("s").alias("node")).distinct() \
        .select("node", F.col("node").alias("label"))
    for _ in range(_LPA_ROUNDS):
        counted = (
            adj.join(labels.withColumnRenamed("node", "t"), "t")
            .groupBy(F.col("s").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        labels = (counted.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1).select("node", "label"))
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.min("node").alias("min_member"),
             F.max("node").alias("max_member"))
        .orderBy(F.desc("n_members"), "community")
    )
